"""[EXT] Multimodal columns: image/audio/video as opaque binary payloads
with typed metadata (SURVEY.md §2.11).

Design: media BYTES ride in a `payload` BinaryType column next to a
`meta` struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages so bytes never round-trip through
Python row-at-a-time.

Codecs: WAV / PNG / BMP decode for real (operators/codecs.py — stdlib
wave/zlib/struct + numpy, no external libraries), dispatched by magic
bytes. Formats that genuinely need a codec library (JPEG/MP3/H.264)
stay behind `decode_stub`, which raises NotImplementedError unless
`fake=True` (the deterministic fake decode keeps the Spark-side
plumbing — schema, batch iteration, partition-preserving shape —
testable for those too).

Scale notes: mapInPandas streams Arrow batches (no full-partition
materialization); `spark.sql.execution.arrow.maxRecordsPerBatch` bounds
peak memory per batch — for ~MB-sized media set it low (e.g. 32). Media
tables should be written with small row groups and the metadata struct in
a separate column chunk so metadata-only queries never read the bytes
(columnar pruning does this for free).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_byte", DoubleType()),
        # True when a REAL decoder ran (WAV/PNG/BMP magic matched);
        # width/height then come from the payload itself, not the meta
        StructField("decoded", BooleanType()),
    ]
)


def decode_stub(payload: bytes, media_type: str, fake: bool) -> dict[str, Any]:
    """The codec seam for formats WITHOUT a real decoder here
    (JPEG/MP3/H.264 — see `decode_media` for the formats with one):
    either raises (honest stub) or derives deterministic fake features
    from the bytes."""
    if not fake:
        raise NotImplementedError(
            "no real decoder for this payload (JPEG/MP3/H.264 need a "
            "codec library); WAV/PNG/BMP decode for real via "
            "operators/codecs.py — pass fake=True for the deterministic "
            "test decode of other formats"
        )
    return {
        "checksum": hashlib.sha256(payload).hexdigest()[:16],
        "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
    }


def decode_media(payload: bytes, media_type: str, fake: bool) -> dict[str, Any]:
    """Dispatch: REAL decode when the magic bytes match a supported
    format (WAV/PNG/BMP), the stub seam otherwise. Real decodes report
    `decoded=True` plus format-true dimensions/duration alongside the
    byte-level features.

    A payload that SNIFFS like a format but fails to decode (magic-byte
    coincidence — document text starting "BM..." sniffs as BMP — or a
    corrupt/unsupported variant like 16-bit PNG) falls back to the stub
    seam instead of crashing the job: sniffing is a 2-8 byte heuristic,
    not a validation. The checksum/byte-mean are computed exactly once
    here; the stub's fake branch is only the raise-or-allow gate."""
    from . import codecs

    base = {
        "checksum": hashlib.sha256(payload).hexdigest()[:16],
        "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
        "decoded": False,
        "width": None,
        "height": None,
        "duration_ms": None,
    }
    kind = codecs.sniff(payload)
    try:
        if kind == "wav":
            d = codecs.wav_decode(payload)
            base.update(decoded=True, duration_ms=d["duration_ms"])
            return base
        if kind in ("png", "bmp"):
            d = codecs.image_decode(payload)
            base.update(decoded=True, width=d["width"], height=d["height"])
            return base
    except Exception:  # noqa: BLE001 — sniff false-positive or corrupt file
        pass
    if not fake:
        decode_stub(payload, media_type, fake=False)  # honest raise
    return base


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. The
    mapInPandas generator preserves partitioning (no shuffle); output
    schema is fixed so downstream plans are stable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                d = decode_media(payload, row["media_type"], fake_decode)
                meta = row["meta"]
                meta_w = None if meta is None else meta["width"]
                meta_h = None if meta is None else meta["height"]
                feats.append(
                    {
                        "asset_id": row["asset_id"],
                        "media_type": row["media_type"],
                        "n_bytes": len(payload),
                        "checksum": d["checksum"],
                        "width": d["width"] if d["decoded"] else meta_w,
                        "height": d["height"] if d["decoded"] else meta_h,
                        "mean_byte": d["mean_byte"],
                        "decoded": d["decoded"],
                    }
                )
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURES_SCHEMA])

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: computes the frame
    timestamps to extract (pure column math — the decode itself is the
    stubbed seam). Demonstrates explode over a computed sequence."""
    # duration < every_ms would make n_frames 0 and sequence(0, -1) count
    # DOWN (Spark defaults the step to -1), emitting two bogus frames —
    # so short clips are filtered out before the sequence is built
    video = media.filter(
        (F.col("media_type") == "video") & (F.col("meta.duration_ms") >= every_ms)
    )
    n_frames = F.floor(F.col("meta.duration_ms") / every_ms).cast("int")
    return video.select(
        "asset_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1, F.lit(1)),
                lambda i: (i * every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def resize_media(
    media: DataFrame,
    target_w: int = 320,
    target_h: int = 240,
    fake_decode: bool = True,
) -> DataFrame:
    """Resize stage: clamp dimensions to the target box and re-encode the
    payload. The codec is the same stubbed seam as `decode_stub` — the
    fake "resample" keeps the leading `len * (new_w*new_h) // (w*h)`
    bytes (exact integer math, so the DuckDB oracle reproduces the output
    size) — while the Spark-side plumbing is real: Arrow-batched
    mapInPandas, fixed output schema, binary in/binary out, rows with no
    decodable dimensions (audio) dropped before the batch loop so the
    stage never branches per-row on nulls."""
    sized = media.filter(
        F.col("meta.width").isNotNull() & F.col("meta.height").isNotNull()
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = [f.name for f in RESIZED_SCHEMA]
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                if not fake_decode:
                    decode_stub(b"", row["media_type"], fake=False)
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                w, h = row["meta"]["width"], row["meta"]["height"]
                nw, nh = min(w, target_w), min(h, target_h)
                out_len = len(payload) * (nw * nh) // (w * h)
                resized = payload[:out_len]
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "media_type": row["media_type"],
                        "new_width": nw,
                        "new_height": nh,
                        "payload": resized,
                        "n_bytes_out": len(resized),
                    }
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return sized.mapInPandas(batches, RESIZED_SCHEMA)


def media_resize_query(documents: DataFrame) -> DataFrame:
    """Registered-query form of the resize stage over the documents-
    derived media table (numeric projection — the payload bytes stay
    executor-side)."""
    resized = resize_media(media_from_documents(documents))
    return resized.select(
        "asset_id", "media_type", "new_width", "new_height", "n_bytes_out"
    )


MEDIA_RESIZE_SQL = """
WITH media AS (
  SELECT doc_id AS asset_id,
    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
         WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
    octet_length(encode(text)) AS n_bytes,
    CAST(n_chars % 640 + 1 AS INTEGER) AS w,
    CAST(n_chars % 480 + 1 AS INTEGER) AS h
  FROM documents
)
SELECT asset_id, media_type,
  LEAST(w, 320) AS new_width,
  LEAST(h, 240) AS new_height,
  n_bytes * (LEAST(w, 320) * LEAST(h, 240)) // (w * h) AS n_bytes_out
FROM media
"""


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic media table over the driver's documents table:
    payload = UTF-8 bytes of the text, media_type cycles by doc_id, meta
    synthesized from n_chars. Gives the multimodal path a real
    sf-scaled input instead of only the tiny synthetic fixture."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def media_features_query(documents: DataFrame) -> DataFrame:
    """Registered-query form: binary payloads -> Arrow-batched
    mapInPandas feature extraction -> SQL-checkable projection (byte
    length + sha256 prefix; the decode itself is the stubbed seam)."""
    feats = extract_features(media_from_documents(documents), fake_decode=True)
    return feats.select("asset_id", "media_type", "n_bytes", "checksum")


MEDIA_FEATURES_SQL = """
SELECT doc_id AS asset_id,
       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(encode(text)) AS n_bytes,
       substr(sha256(text), 1, 16) AS checksum
FROM documents
"""


def synth_media(spark, n: int = 20) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes are
    zlib-compressed repeats keyed by asset_id."""
    rows = []
    types = ["image", "audio", "video"]
    for i in range(n):
        mt = types[i % 3]
        payload = zlib.compress((f"asset-{i}-" * (i + 1)).encode())
        rows.append(
            (
                i,
                mt,
                bytearray(payload),
                (64 + i, 48 + i, 1000 * (i + 1), "fake") if mt != "audio" else (None, None, 1000 * (i + 1), "pcm"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample_query(documents: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Registered-query form of the frame-sampling plan over the
    documents-derived media table: one row per (video, frame timestamp).
    Pure column math (sequence + explode) — the decode of each frame is
    the stubbed codec seam; clips shorter than the sampling interval
    emit no rows (pinned by test_multimodal's short-clip case)."""
    return frame_sample_plan(media_from_documents(documents), every_ms)


FRAME_SAMPLE_SQL = """
WITH media AS (
  SELECT doc_id AS asset_id,
    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
         WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
    CAST(n_chars * 10 AS BIGINT) AS duration_ms
  FROM documents
)
SELECT asset_id,
       CAST(unnest(generate_series(0, CAST(duration_ms // 1000 AS BIGINT) - 1))
            * 1000 AS BIGINT) AS frame_ts_ms
FROM media
WHERE media_type = 'video' AND duration_ms >= 1000
"""


# ---------------------------------------------------------------------------
# REAL codec paths (operators/codecs.py): image resize, WAV roundtrip
# ---------------------------------------------------------------------------

IMAGE_RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("format", StringType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("pixel_sum", LongType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 320, target_h: int = 240
) -> DataFrame:
    """REAL image resize: payloads whose magic bytes decode (PNG/BMP)
    are decoded, nearest-neighbor resampled in numpy, and re-encoded in
    their source format; rows that don't decode are dropped (they
    belong to the stub seam). Arrow-batched mapInPandas, pixel math
    vectorized per image."""
    import numpy as np

    from . import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_RESIZED_SCHEMA]
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                kind = codecs.sniff(payload)
                if kind not in ("png", "bmp"):
                    continue
                try:
                    d = codecs.image_decode(payload)
                except Exception:  # noqa: BLE001 — sniff false-positive
                    continue
                nw = min(d["width"], target_w)
                nh = min(d["height"], target_h)
                px = codecs.resize_nn(d["pixels"], nw, nh)
                out = (
                    codecs.png_encode(px)
                    if kind == "png"
                    else codecs.bmp_encode(px)
                )
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "format": kind,
                        "new_width": nw,
                        "new_height": nh,
                        "payload": out,
                        "pixel_sum": int(np.asarray(px, dtype=np.int64).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, IMAGE_RESIZED_SCHEMA)


WAV_RATE = 8000

WAV_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("energy", LongType()),
        StructField("n_crossings", LongType()),
        StructField("peak", LongType()),
    ]
)


def wav_roundtrip_query(documents: DataFrame) -> DataFrame:
    """[EXT] REAL audio codec end-to-end: text-derived int16 samples
    (`s_i = (ascii(c_i) * 37) % 256 - 128` — mixed signs so zero
    crossings are non-trivial) are encoded to genuine RIFF/WAVE bytes
    (codecs.wav_encode) and decoded back through the real parser
    (codecs.wav_decode); the emitted features are exact integers the
    DuckDB oracle replays from the same source characters — proving the
    container roundtrips samples losslessly, not just that two fakes
    agree. One Arrow-batched mapInPandas stage, no shuffle."""
    import numpy as np

    from . import codecs

    audio = documents.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("asset_id"), "text"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WAV_ROUNDTRIP_SCHEMA]
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                chars = np.frombuffer(
                    row["text"].encode("ascii"), dtype=np.uint8
                ).astype(np.int64)
                samples = ((chars * 37) % 256 - 128).astype(np.int16)
                wav = codecs.wav_encode(samples, WAV_RATE)
                d = codecs.wav_decode(wav)
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "n_samples": d["n_samples"],
                        "sample_rate": d["sample_rate"],
                        "duration_ms": d["duration_ms"],
                        "energy": d["energy"],
                        "n_crossings": d["n_crossings"],
                        "peak": d["peak"],
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return audio.mapInPandas(batches, WAV_ROUNDTRIP_SCHEMA)


WAV_ROUNDTRIP_SQL = f"""
WITH audio AS (
  SELECT doc_id AS asset_id,
         list_transform(string_split(text, ''),
                        c -> (ascii(c) * 37) % 256 - 128) AS s
  FROM documents WHERE doc_id % 3 = 1
)
SELECT asset_id,
  CAST(len(s) AS BIGINT) AS n_samples,
  {WAV_RATE} AS sample_rate,
  CAST(len(s) AS BIGINT) * 1000 // {WAV_RATE} AS duration_ms,
  CAST(COALESCE(list_sum(list_transform(s, x -> CAST(x AS BIGINT) * x)), 0)
       AS BIGINT) AS energy,
  CAST(COALESCE(list_sum(list_transform(range(1, len(s)),
        i -> CASE WHEN (s[i] >= 0) <> (s[i+1] >= 0) THEN 1 ELSE 0 END)), 0)
       AS BIGINT) AS n_crossings,
  CAST(COALESCE(list_max(list_transform(s, x -> abs(x))), 0) AS BIGINT)
    AS peak
FROM audio
"""


PNG_W = 24  # fixed roundtrip image width (3-channel rows)

PNG_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_png_gt", BooleanType()),
        StructField("pixel_sum", LongType()),
    ]
)


def png_roundtrip_query(documents: DataFrame) -> DataFrame:
    """[EXT] REAL image codec end-to-end: the document's leading
    `h*W*3` bytes become an (h, W, 3) uint8 image, encoded to genuine
    PNG bytes (zlib IDAT + CRC chunks) and decoded back through the
    real parser; `pixel_sum` over the decoded pixels must equal the sum
    the DuckDB oracle computes from the raw characters — the decode
    reverses the encode bit-exactly on corpus-scale data. `n_png_gt`
    additionally pins that a real (compressed, chunked) container was
    produced, not a passthrough: header+chunk overhead makes tiny PNGs
    BIGGER than raw, so the pinned fact is container-shaped size, not
    compression."""
    import numpy as np

    from . import codecs

    docs = documents.filter(
        (F.col("doc_id") % 3 == 0) & (F.col("n_chars") >= 3 * PNG_W)
    ).select(F.col("doc_id").alias("asset_id"), "text")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PNG_ROUNDTRIP_SCHEMA]
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                data = np.frombuffer(
                    row["text"].encode("ascii"), dtype=np.uint8
                )
                h = data.size // (PNG_W * 3)
                px = data[: h * PNG_W * 3].reshape(h, PNG_W, 3)
                png = codecs.png_encode(px)
                d = codecs.png_decode(png)
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "n_png_gt": len(png) > 44,  # sig+IHDR+IEND shell
                        "pixel_sum": int(
                            d["pixels"].astype(np.int64).sum()
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(batches, PNG_ROUNDTRIP_SCHEMA)


PNG_ROUNDTRIP_SQL = f"""
WITH img AS (
  SELECT doc_id AS asset_id,
         list_transform(string_split(text, ''), c -> ascii(c)) AS b
  FROM documents WHERE doc_id % 3 = 0 AND n_chars >= {3 * PNG_W}
)
SELECT asset_id,
  {PNG_W} AS width,
  CAST(len(b) // {PNG_W * 3} AS INTEGER) AS height,
  3 AS channels,
  TRUE AS n_png_gt,
  CAST(list_sum(list_transform(
        range(1, (len(b) // {PNG_W * 3}) * {PNG_W * 3} + 1),
        i -> CAST(b[i] AS BIGINT))) AS BIGINT) AS pixel_sum
FROM img
"""


# ---------------------------------------------------------------------------
# batch-inference seam: embedding generation for document chunks
# ---------------------------------------------------------------------------

EMBED_DIM = 8
EMBED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_ix", IntegerType()),
        StructField("chunk_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def embed_chunks(chunks: DataFrame) -> DataFrame:
    """Batch "inference" over document chunks: the Arrow-batched
    mapInPandas seam a real embedding model plugs into — whole Arrow
    batches become one numpy matrix op per batch, never per-row Python.
    The model itself is a deterministic arithmetic fake (dim j of chunk
    c = ((chunk_id * (j+1)) mod 1000) / 1000), so the full pipeline —
    batch shape, schema, partition preservation — is exercised and the
    SQL oracle can replay the "model" exactly. Swap `_fake_model` for an
    ONNX/torch call and nothing upstream or downstream changes."""

    def _fake_model(ids: "np.ndarray") -> "np.ndarray":
        j = np.arange(1, EMBED_DIM + 1, dtype=np.int64)
        return ((ids[:, None] * j[None, :]) % 1000) / 1000.0

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            emb = _fake_model(pdf["chunk_id"].to_numpy(dtype=np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "chunk_ix": pdf["chunk_ix"],
                    "chunk_id": pdf["chunk_id"],
                    "embedding": list(emb),
                }
            )

    return chunks.mapInPandas(batches, EMBED_SCHEMA)


def embed_chunks_query(documents: DataFrame) -> DataFrame:
    """chunk -> embed -> summarize: emits per-chunk embedding head and
    an integer-scaled norm so the driver's value-hash is stable."""
    from .text import chunk_documents

    embedded = embed_chunks(chunk_documents(documents))
    sq_milli = F.aggregate(
        F.transform(
            "embedding", lambda x: (x * 1000).cast("long") * (x * 1000).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return embedded.select(
        "doc_id",
        "chunk_ix",
        "chunk_id",
        F.element_at("embedding", 1).alias("e0"),
        F.element_at("embedding", EMBED_DIM).alias("e_last"),
        sq_milli.alias("sq_norm_micro"),
    )


def _embed_sql() -> str:
    from .text import CHUNK_DOCUMENTS_SQL

    dims = ", ".join(
        f"((chunk_id * {j}) % 1000) / 1000.0 AS d{j}" for j in range(1, EMBED_DIM + 1)
    )
    sq = " + ".join(
        f"CAST(((chunk_id * {j}) % 1000) AS BIGINT)"
        f" * CAST(((chunk_id * {j}) % 1000) AS BIGINT)"
        for j in range(1, EMBED_DIM + 1)
    )
    return f"""
WITH chunks AS ({CHUNK_DOCUMENTS_SQL})
SELECT doc_id, chunk_ix, chunk_id,
       ((chunk_id * 1) % 1000) / 1000.0 AS e0,
       ((chunk_id * {EMBED_DIM}) % 1000) / 1000.0 AS e_last,
       {sq} AS sq_norm_micro
FROM chunks
"""


EMBED_CHUNKS_SQL = _embed_sql()


# ---------------------------------------------------------------------------
# audio windowing (VAD-style framing over the stubbed decode)
# ---------------------------------------------------------------------------

AUDIO_WINDOW = 32  # samples per analysis window


def audio_window_features(documents: DataFrame) -> DataFrame:
    """[EXT] Audio analysis-window features over the documents-derived
    media table: the framing/feature plumbing of a voice-activity /
    audio-quality pipeline (fixed windows -> per-window energy +
    zero-crossing count), with the CODEC decode stubbed to the
    deterministic byte->sample map `s_i = ascii(char_i) - 128` (the
    text bytes ARE the payload bytes — media_from_documents encodes
    UTF-8). Real deployments swap the decode for the codec seam
    (decode_stub); everything downstream — windowing, energy,
    crossings — is exact integer column math and stays as-is.

    Plan: one narrow projection builds samples and windows per row
    (transform/slice/aggregate inside codegen), posexplode emits one
    row per window — no shuffle at all until a consumer aggregates."""
    samples = F.transform(
        F.split(F.col("text"), ""), lambda c: F.ascii(c) - 128
    )
    audio = documents.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("asset_id"), samples.alias("s")
    )
    n_win = F.floor((F.size("s") - 1) / AUDIO_WINDOW).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_win),
        lambda i: F.slice("s", i * AUDIO_WINDOW + 1, AUDIO_WINDOW),
    )
    per_win = audio.select(
        "asset_id", F.posexplode(windows).alias("window_ix", "w")
    )
    energy = F.aggregate(
        "w", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long") * x
    )
    # zero crossings: sign changes between adjacent samples (zip_with
    # of the window against its shift; null tail filtered by the concat)
    signs = F.transform("w", lambda x: (x >= 0).cast("int"))
    crossings = F.aggregate(
        F.zip_with(
            signs,
            F.slice(signs, 2, F.size(signs)),
            lambda a, b: F.when(b.isNull(), 0).otherwise(
                (a != b).cast("int")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return per_win.select(
        "asset_id",
        F.col("window_ix").cast("long").alias("window_ix"),
        F.size("w").cast("long").alias("n_samples"),
        energy.alias("energy"),
        crossings.alias("n_crossings"),
    )


AUDIO_WINDOW_SQL = f"""
WITH audio AS (
  SELECT doc_id AS asset_id,
         list_transform(string_split(text, ''), c -> ascii(c) - 128) AS s
  FROM documents WHERE doc_id % 3 = 1
),
win AS (
  SELECT asset_id,
         CAST(unnest(range(0, (len(s)-1)//{AUDIO_WINDOW} + 1)) AS BIGINT)
           AS window_ix,
         unnest(list_transform(range(0, (len(s)-1)//{AUDIO_WINDOW} + 1),
                i -> s[i*{AUDIO_WINDOW} + 1 : i*{AUDIO_WINDOW} + {AUDIO_WINDOW}]))
           AS w
  FROM audio
)
SELECT asset_id, window_ix,
  CAST(len(w) AS BIGINT) AS n_samples,
  CAST(list_sum(list_transform(w, x -> CAST(x AS BIGINT) * x)) AS BIGINT)
    AS energy,
  CAST(COALESCE(list_sum(list_transform(range(1, len(w)),
        i -> CASE WHEN (w[i] >= 0) <> (w[i+1] >= 0) THEN 1 ELSE 0 END)), 0)
       AS BIGINT) AS n_crossings
FROM win
"""
