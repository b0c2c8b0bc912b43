"""Scale-up smoke (VERDICT r3 directive 6): every plan-shape claim in
test_plans.py is pinned at sf0.001/0.1; this module executes the
dedup/ANN headline path on a ~10x corpus and asserts (a) wall time grows
~linearly — a plan that silently flipped to CartesianProduct or a
single-partition exchange would blow the bound — and (b) the plan-shape
assertions still hold at the larger size.

Gated behind SPARK_GRAFT_SCALE_SMOKE=1 (runs ~3-5 min; the per-round
pytest sweep stays fast). Replicas are DECORRELATED (replica token
appended to text, replica offset added to embedding dim 0) so cross-
replica pairs stay below thresholds and the true output grows linearly
with the corpus — replicating verbatim would plant 10-clone groups whose
pair count grows quadratically in the replication factor, measuring the
corpus, not the engine."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from trail_condition_etl_spark import catalog, plans
from trail_condition_etl_spark.operators import dedup, similarity

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="scale smoke: set SPARK_GRAFT_SCALE_SMOKE=1 (~3-5 min)",
)

BASE_SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 10


def _replicated_docs(spark, tmp, n_replicas: int) -> str:
    # decorrelate replicas by tagging EVERY TOKEN with the replica id:
    # within a replica the shingle-set relations (and so every true
    # Jaccard) are exactly the base corpus's, while cross-replica
    # shingle sets are fully disjoint — output must grow ~linearly
    base = catalog.load_table(spark, BASE_SF_DIR, "documents")

    def tag_tokens(r: int):
        return F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit(f"_{r}")),
            ),
        )

    parts = [
        base.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            tag_tokens(r).alias("text"),
        )
        for r in range(n_replicas)
    ]
    out = os.path.join(tmp, f"docs_{n_replicas}x")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)
    return out

def _replicated_emb(spark, tmp, n_replicas: int) -> str:
    base = catalog.load_table(spark, BASE_SF_DIR, "embeddings")
    # decorrelate replicas with per-(replica, dim) SIGN FLIPS: within a
    # replica every pairwise cosine is EXACTLY the base corpus's (signs
    # square away), while cross-replica cosines scatter to ~0 on this
    # isotropic corpus — so output structure replicates linearly
    def sign_flip(r: int):
        def f(x, i):
            even = (
                F.pmod(
                    F.xxhash64(i.cast("long") * 1_000_003 + F.lit(r)), F.lit(2)
                )
                == 0
            )
            return F.when(even, x).otherwise(-x).cast("float")

        return f

    parts = [
        base.select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            F.col("label"),
            F.transform("embedding", sign_flip(r)).alias("embedding"),
        )
        for r in range(n_replicas)
    ]
    out = os.path.join(tmp, f"emb_{n_replicas}x")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)
    return out


def _timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def _timed_force(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def test_minhash_pair_graph_scales_linearly(spark, tmp_path):
    """Time AND output both ~linear at 10x: appended replica tokens keep
    cross-replica Jaccard near the ~0.03 background, far under the 0.5
    threshold, so pairs multiply ~REPLICAS x (text shingle sets, unlike
    the 64-dim embedding cosine tail, have no near-threshold background
    mass) — and wall time within shuffle-constant headroom of 10x."""
    tmp = str(tmp_path)
    p1 = _replicated_docs(spark, tmp, 1)
    p10 = _replicated_docs(spark, tmp, REPLICAS)
    d1 = spark.read.parquet(p1)
    d10 = spark.read.parquet(p10)
    t1, n1 = _timed_count(dedup.minhash_pairs(d1))
    spark.catalog.clearCache()
    plan10 = dedup.minhash_pairs(d10)
    assert "CartesianProduct" not in plans.simple_plan(plan10)
    assert not plans.has_single_partition_exchange(plan10)
    t10, n10 = _timed_count(plan10)
    spark.catalog.clearCache()
    # linear-ish: 10x data may cost up to ~3x headroom over 10x time
    # (shuffle constants); a quadratic flip would be ~100x
    assert t10 < 30 * t1 + 10, f"pair graph superlinear: {t1:.1f}s -> {t10:.1f}s"
    assert n1 > 0 and n10 <= 12 * n1, f"pairs exploded: {n1} -> {n10}"


def test_ivf_pq_topk_scales_linearly(spark, tmp_path):
    tmp = str(tmp_path)
    e1 = spark.read.parquet(_replicated_emb(spark, tmp, 1))
    e10 = spark.read.parquet(_replicated_emb(spark, tmp, REPLICAS))
    t1 = _timed_force(similarity.ivf_pq_topk(e1))
    spark.catalog.clearCache()
    plan10 = similarity.ivf_pq_topk(e10)
    assert "CartesianProduct" not in plans.simple_plan(plan10)
    assert not plans.has_single_partition_exchange(plan10)
    t10 = _timed_force(plan10)
    spark.catalog.clearCache()
    assert t10 < 30 * t1 + 10, f"ivf_pq_topk superlinear: {t1:.1f}s -> {t10:.1f}s"


def test_clustered_skip_scan_prunes_proportionally(spark, tmp_path):
    """The manifest read path's scale claim: at 10x rows AND 10x files,
    a fixed-selectivity predicate keeps the opened-file FRACTION ~flat —
    metadata skipping makes IO track matching data, not table size.
    price is a permutation of 0..n-1 (7919 coprime to both sizes), so
    the 5% band has exactly the same selectivity in both tables and a
    known row count."""
    from trail_condition_etl_spark.sinks import manifest as mf

    def build(n, files_per_bucket):
        rows = spark.range(n).select(
            F.col("id").alias("k"),
            ((F.col("id") * 7919) % n).cast("double").alias("price"),
        )
        t = os.path.join(str(tmp_path), f"t{n}")
        mf.manifest_upsert(spark, t, rows, ["k"], n_buckets=8)
        mf.optimize_table(
            spark, t, cluster_by=["price"], files_per_bucket=files_per_bucket
        )
        return t

    def opened_fraction(t, n):
        skip = [("price", "between", (0.0, float(int(n * 0.05))))]
        df = mf.read_manifest_table(spark, t, skip=skip)
        total = sum(
            len(v) for v in mf.read_manifest(t)["file_stats"].values()
        )
        assert df.count() == int(n * 0.05) + 1  # exact under the permutation
        return len(df.inputFiles()) / total

    n1, n10 = 20_000, 200_000
    f1 = opened_fraction(build(n1, 4), n1)
    f10 = opened_fraction(build(n10, 40), n10)
    assert f10 < 0.25, f"5% band opened {f10:.0%} of a 10x table"
    assert f10 < 2 * f1 + 0.05, f"pruned fraction degraded: {f1:.0%} -> {f10:.0%}"


def test_mor_delete_bytes_track_deleted_keys_not_table_size(spark, tmp_path):
    """The merge-on-read DELETE's scale claim: the commit's written
    bytes are proportional to the DELETED KEYS, never the table. Delete
    the SAME 100 keys from a 1x and a 10x table — the delete-file bytes
    must stay ~flat while a copy-on-write delete would have rewritten
    10x the data (at 100 TB, deleting 0.1% of rows scattered across all
    buckets would otherwise rewrite the whole table)."""
    from trail_condition_etl_spark.sinks import manifest as mf

    def deleted_bytes(n):
        rows = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        t = os.path.join(str(tmp_path), f"d{n}")
        mf.manifest_upsert(spark, t, rows, ["k"], n_buckets=8)
        mf.delete_where(spark, t, "k < 100")  # same 100 keys both sizes
        m = mf.read_manifest(t)
        total = 0
        for lst in m["deletes"].values():
            for d in lst:
                dd = os.path.join(t, d)
                total += sum(
                    os.path.getsize(os.path.join(dd, f))
                    for f in os.listdir(dd)
                )
        assert mf.manifest_row_count(t) == n - 100
        # and no segment was rewritten
        assert m["buckets"] == mf.read_manifest(t, 1)["buckets"]
        return total

    b1 = deleted_bytes(20_000)
    b10 = deleted_bytes(200_000)
    assert b10 < 2 * b1 + 4096, (
        f"MoR delete bytes grew with table size: {b1} -> {b10}"
    )


# NOTE: an embedding-side output-growth check is deliberately absent.
# The sf0.1 corpus has no high-cosine planted duplicates (max observed
# pair cosine ~0.6), so at any usable threshold the pair count is
# dominated by the BACKGROUND cosine tail of 64-dim vectors — a genuine
# O(n²) property of the data distribution that no engine can make
# linear. The engine-side guarantees at scale are what the two tests
# above pin: candidate generation stays a band equi-join (no
# CartesianProduct), no single-partition funnel, and wall time tracks
# candidate volume.
