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
