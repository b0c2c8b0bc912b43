"""Deterministic 10x amplification of a testdata scale factor.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md); the "designed for
100 TB" plan claims need at least one MEASURED scale notch above sf0.1
(VERDICT r7 directive 4). This builds an sf1.0-equivalent star schema by
replicating sf0.1 ten times with join-preserving key offsets — every
replica's foreign keys shift by the SAME stride as their dimension, so
join fan-outs (and therefore per-row work) match the source exactly and
a runtime ratio against sf0.1 measures data-volume scaling, nothing
else. /root/testdata is read-only, so output lands in the repo-local
cache dir (gitignored) and regenerates only when the source snapshot
changes.

Distribution notes (what is deliberately NOT identical per replica):

* `documents.text` is consonant-rotated per replica (`translate`), so a
  replica is NOT a near-duplicate of the original — without this,
  minhash/semantic dedup at sf1 would see every doc in a 10-clique and
  pair counts would scale ~45x instead of the corpus's own ~10x dup
  structure, poisoning the scaling ratio.
* `embeddings.embedding` gets a small per-replica coordinate-dependent
  perturbation (a pure scalar multiple would leave cosine similarity
  bit-identical and create 10-way ties in every ANN result).
* `events.ts` keeps the source time range: 10x density, same span —
  user-keyed sessionization work per user is unchanged, user count
  scales 10x.
"""

from __future__ import annotations

import json
import os

REPLICAS = 10
SRC_DEFAULT = "/root/testdata/sf0.1"

#: per-table (key column -> stride source). A stride is the next power
#: of ten above the column's max, computed from the SOURCE once; the
#: same stride is used wherever the key appears as a foreign key.
_KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "part": {"p_partkey": "p_partkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
_COPY = ["region", "nation"]  # fixed-size dimensions, single copy

_CONSONANTS = "bcdfghjklm"


def _strides(spark, src: str) -> dict[str, int]:
    from pyspark.sql import functions as F

    out: dict[str, int] = {}
    per_table = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t, cols in per_table.items():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        for c in cols:
            m = int(row[c] or 0) + 1
            s = 1
            while s < m:
                s *= 10
            out[c] = s
    return out


def _src_fingerprint(src: str) -> dict:
    out = {}
    for fn in sorted(os.listdir(src)):
        if fn.endswith(".parquet"):
            st = os.stat(os.path.join(src, fn))
            out[fn] = [st.st_size, st.st_mtime_ns]
    return out


def build(spark, src: str = SRC_DEFAULT, out: str | None = None) -> str:
    """Build (or reuse) the amplified dataset; returns its directory.
    Idempotent: a marker file records the source fingerprint, and a
    matching marker short-circuits the whole build."""
    from pyspark.sql import functions as F

    if out is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = os.path.join(repo, ".scale_cache", "sf1.0")
    marker = os.path.join(out, "_BUILT.json")
    fp = {"src": src, "replicas": REPLICAS, "files": _src_fingerprint(src)}
    try:
        with open(marker) as fh:
            if json.load(fh) == fp:
                return out
    except (OSError, ValueError):
        pass
    os.makedirs(out, exist_ok=True)
    strides = _strides(spark, src)

    for t in _COPY:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))

    for t, keymap in _KEYED.items():
        base = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        reps = []
        for i in range(REPLICAS):
            r = base
            for col, stride_src in keymap.items():
                if i:
                    r = r.withColumn(
                        col, F.col(col) + F.lit(i * strides[stride_src])
                    )
            if t == "documents" and i:
                rot = _CONSONANTS[i:] + _CONSONANTS[:i]
                r = r.withColumn(
                    "text", F.translate(F.col("text"), _CONSONANTS, rot)
                )
            if t == "embeddings" and i:
                # coordinate-dependent tilt: changes direction (so no
                # exact cross-replica ties) while keeping norms close
                r = r.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> CAST(x * "
                        f"(1.0D + {0.017 * i:.4f} * ((j % 5) - 2)) "
                        "AS FLOAT))"
                    ),
                )
            reps.append(r)
        amplified = reps[0]
        for r in reps[1:]:
            amplified = amplified.unionByName(r)
        amplified.write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )

    tmp = f"{marker}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(fp, fh)
    os.replace(tmp, marker)
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from trail_condition_etl_spark.session import get_spark

    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    print(build(spark))
