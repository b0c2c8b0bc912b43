"""Focused pins for the r13 optimization changes.

Covers the internals each optimization touched:
* the manifest multi-path read's listing strategy (driver-side listing
  for local filesystems, Spark's distributed-listing default for object
  stores, env override, and conf save/restore);
* the stateful_sessions stream-source staging artifact (second
  invocation reuses the staged input instead of re-writing it, and the
  streamed result is unchanged).

The classifier's single-exchange plan is pinned where the other plan
shapes live (tests/test_plans.py::test_classifier_single_fact_shuffle).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trail_condition_etl_spark.sinks import manifest as mf


def test_listing_threshold_local_paths_disable_distributed_listing():
    # bare paths and file: URIs are both local -> drive the listing from
    # the driver (effectively infinite threshold)
    assert mf._listing_threshold(["/tmp/a", "file:/tmp/b"]) == 1 << 30


def test_listing_threshold_remote_paths_keep_session_default():
    # any object-store/remote path in the set -> leave Spark's
    # parallel-discovery default alone (None = no override)
    assert mf._listing_threshold(["s3a://bucket/x", "/tmp/a"]) is None
    assert mf._listing_threshold(["hdfs://nn/x"]) is None


def test_listing_threshold_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LIST_THRESHOLD", "7")
    assert mf._listing_threshold(["s3a://b/x"]) == 7
    assert mf._listing_threshold(["/tmp/a"]) == 7


def test_read_parquet_paths_reads_all_and_restores_conf(spark, tmp_path):
    # >32 local dirs exercises the override branch; the session value
    # must be byte-identical afterwards (later remote reads depend on it)
    root = str(tmp_path / "many")
    spark.range(40).select(
        F.col("id"), (F.col("id") % 40).alias("b")
    ).write.partitionBy("b").parquet(root)
    dirs = sorted(
        os.path.join(root, d) for d in os.listdir(root) if d.startswith("b=")
    )
    assert len(dirs) == 40
    key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    before = spark.conf.get(key)
    df = mf._read_parquet_paths(spark, "id long", dirs)
    assert df.count() == 40
    assert spark.conf.get(key) == before


def test_stateful_sessions_staging_is_per_corpus_artifact(spark):
    # the staged stream-source copy of the input table is built once per
    # corpus snapshot; the stateful computation itself (micro-batch
    # replay + state machine) still runs fresh each call and must give
    # the same answer
    from trail_condition_etl_spark.operators import artifacts
    from trail_condition_etl_spark.streaming.stateful import (
        stateful_sessions_query,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    first = sorted(
        tuple(r) for r in stateful_sessions_query(spark, sf).collect()
    )
    builds_after_first = artifacts.build_count()
    second = sorted(
        tuple(r) for r in stateful_sessions_query(spark, sf).collect()
    )
    assert artifacts.build_count() == builds_after_first
    assert first == second


# ---------------------------------------------------------------------------
# batch 2: shuffle less, compute once, stay in codegen
# ---------------------------------------------------------------------------


# (a third rejected candidate — the unrolled element_at `_dot` chain —
# is likewise documented in OPTIMIZATION_r13.md; _dot stays the fold.)


def test_ann_recall_report_truth_join_is_broadcast(spark):
    # the bounded truth side (QUERY_K*k rows) broadcasts into the hit
    # joins — a SortMergeJoin means it is being shuffled+sorted again
    from trail_condition_etl_spark import plans, registry

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = registry.queries()["ann_recall_report"](spark, sf)
    p = plans.formatted_plan(df)
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


# (two optimization candidates measured here and REJECTED — touched-
# subgraph label propagation and the hashed-gid decontaminate cache —
# are documented in OPTIMIZATION_r13.md; their pins were removed with
# the reverts.)


def test_cms_estimate_reuses_single_tokenize_exchange(spark):
    # one tokenize pass: the counter build and the exact-count probe
    # share the groupBy('tok') subtree, which the executed plan
    # materializes once and reuses (ReusedExchange under AQE)
    from trail_condition_etl_spark import plans, registry

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = registry.queries()["cms_estimate"](spark, sf)
    df.collect()
    assert "ReusedExchange" in plans.formatted_plan(df)


def test_ivf_pq_encode_runs_once_not_duplicated(spark):
    # the corpus encode UDF is marked nondeterministic so the optimizer
    # cannot split it into one ArrowEvalPython for the join-key filter
    # and a second for the code projection — exactly ONE python-eval
    # node may touch the corpus
    import re

    from trail_condition_etl_spark import plans, registry

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = registry.queries()["ivf_pq_topk"](spark, sf)
    p = plans.formatted_plan(df)
    n = len(re.findall(r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython)", p))
    assert n == 1
