"""Real media codecs (operators/codecs.py): WAV/PNG/BMP roundtrips,
PNG scanline-filter reconstruction (all five filter types, including
the ones our encoder never emits), nearest-neighbor resize, and the
Spark-side real-decode paths in operators/multimodal.py."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from trail_condition_etl_spark.operators import codecs, multimodal


def test_wav_roundtrip_exact():
    s = ((np.arange(1000) * 37 + 11) % 256 - 128).astype(np.int16)
    d = codecs.wav_decode(codecs.wav_encode(s, 16000))
    assert d["sample_rate"] == 16000
    assert d["n_samples"] == 1000
    assert np.array_equal(d["samples"], s.astype(np.int64))
    s64 = s.astype(np.int64)
    assert d["energy"] == int((s64 * s64).sum())
    signs = s64 >= 0
    assert d["n_crossings"] == int((signs[1:] != signs[:-1]).sum())
    assert d["peak"] == int(np.abs(s64).max())
    assert d["duration_ms"] == 1000 * 1000 // 16000


def test_wav_rejects_unsupported_width():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x00\x10\x20")
    with pytest.raises(NotImplementedError):
        codecs.wav_decode(buf.getvalue())


@pytest.mark.parametrize("shape", [(13, 17, 3), (8, 9), (5, 6, 4), (4, 5, 2)])
def test_png_roundtrip(shape):
    px = np.random.default_rng(3).integers(0, 256, size=shape, dtype=np.uint8)
    out = codecs.png_decode(codecs.png_encode(px))
    assert (out["height"], out["width"]) == (shape[0], shape[1])
    assert np.array_equal(out["pixels"].reshape(px.shape), px)


def _forward_filter(px: np.ndarray, ftype: int) -> bytes:
    """Apply a PNG forward filter (spec §9) so the decoder's
    reconstruction of EVERY filter type is exercised — our encoder only
    emits type 0."""
    h, stride = px.shape
    bpp = 3  # tests use RGB
    raw = b""
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = px[y].astype(np.int64)
        out = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) & 0xFF
        raw += bytes([ftype]) + out.astype(np.uint8).tobytes()
        prev = line
    return raw


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decoder_reconstructs_every_filter_type(ftype):
    rng = np.random.default_rng(ftype + 10)
    w, h = 6, 5
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    flat = px.reshape(h, w * 3)
    raw = _forward_filter(flat, ftype)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        codecs._PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(raw))
        + codecs._chunk(b"IEND", b"")
    )
    out = codecs.png_decode(png)
    assert np.array_equal(out["pixels"], px), f"filter {ftype}"


def test_bmp_roundtrip_with_row_padding():
    # w=7 -> row length 21, padded to 24: exercises the 4-byte padding
    px = np.random.default_rng(5).integers(0, 256, size=(4, 7, 3), dtype=np.uint8)
    out = codecs.bmp_decode(codecs.bmp_encode(px))
    assert (out["width"], out["height"]) == (7, 4)
    assert np.array_equal(out["pixels"], px)


def test_resize_nn_exact_sampling():
    px = np.arange(12 * 10 * 3, dtype=np.uint8).reshape(12, 10, 3)
    out = codecs.resize_nn(px, 4, 5)
    assert out.shape == (5, 4, 3)
    for y in range(5):
        for x in range(4):
            assert np.array_equal(out[y, x], px[(y * 12) // 5, (x * 10) // 4])


def test_sniff_false_positive_falls_back_to_stub():
    """Document text starting 'BM'/'RIFF' sniffs like a media format
    but must NOT crash the pipeline: decode_media falls back to the
    stub features (sniffing is a heuristic, not validation), and
    resize_images skips the row."""
    for text in (b"BMW recall notice for 2024 models", b"BM25 scoring notes",
                 b"RIFFle through the archives WAVEring"):
        d = multimodal.decode_media(text, "image", fake=True)
        assert not d["decoded"] and d["width"] is None
    # honest stub still raises for undecodable payloads when fake=False
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"BM25 scoring notes", "image", fake=False)


def test_resize_images_skips_sniff_false_positives(spark):
    rows = [(0, "image", bytearray(b"BM garbage that is not a bitmap"),
             (9, 9, None, "txt"))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    assert multimodal.resize_images(media).count() == 0


def test_sniff_and_decode_media_dispatch():
    wav = codecs.wav_encode(np.array([1, -2, 3], dtype=np.int16))
    png = codecs.png_encode(np.zeros((2, 2, 3), dtype=np.uint8))
    bmp = codecs.bmp_encode(np.zeros((2, 2, 3), dtype=np.uint8))
    assert [codecs.sniff(p) for p in (wav, png, bmp)] == ["wav", "png", "bmp"]
    d = multimodal.decode_media(wav, "audio", fake=False)
    assert d["decoded"] and d["duration_ms"] == 3 * 1000 // 8000
    d = multimodal.decode_media(png, "image", fake=False)
    assert d["decoded"] and (d["width"], d["height"]) == (2, 2)
    # unknown format still hits the honest stub
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\xff\xd8\xff\xe0jpeg", "image", fake=False)


def _real_media(spark):
    """Synthetic media table whose payloads are GENUINE WAV/PNG/BMP."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(9):
        if i % 3 == 0:
            px = rng.integers(0, 256, size=(10 + i, 8 + i, 3), dtype=np.uint8)
            payload, mt = codecs.png_encode(px), "image"
            meta = (999, 999, None, "png")  # deliberately wrong meta dims
        elif i % 3 == 1:
            s = rng.integers(-128, 128, size=50 + i).astype(np.int16)
            payload, mt = codecs.wav_encode(s), "audio"
            meta = (None, None, 0, "wav")
        else:
            px = rng.integers(0, 256, size=(6 + i, 5 + i, 3), dtype=np.uint8)
            payload, mt = codecs.bmp_encode(px), "image"
            meta = (999, 999, None, "bmp")
        rows.append((i, mt, bytearray(payload), meta))
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_uses_real_decode(spark):
    feats = {
        r.asset_id: r
        for r in multimodal.extract_features(
            _real_media(spark), fake_decode=False
        ).collect()
    }
    assert all(r.decoded for r in feats.values())
    # format-true dimensions override the (deliberately wrong) meta
    assert (feats[0].width, feats[0].height) == (8, 10)
    assert (feats[2].width, feats[2].height) == (7, 8)
    assert feats[1].width is None  # audio has no dims


def test_resize_images_real_roundtrip(spark):
    out = {
        r.asset_id: r
        for r in multimodal.resize_images(
            _real_media(spark), target_w=6, target_h=7
        ).collect()
    }
    assert set(out) == {0, 2, 3, 5, 6, 8}  # audio rows dropped
    for r in out.values():
        assert r.new_width <= 6 and r.new_height <= 7
        # the re-encoded payload decodes to the advertised dimensions
        d = codecs.image_decode(bytes(r.payload))
        assert (d["width"], d["height"]) == (r.new_width, r.new_height)
        assert int(np.asarray(d["pixels"], dtype=np.int64).sum()) == r.pixel_sum
