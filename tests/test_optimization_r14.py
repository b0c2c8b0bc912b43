"""Focused pins for the r14 optimization round.

Covers the bench-harness observability fixes (VERDICT r13 directive 2):
* the LAST output line carries the per-query steady map within the
  driver's ~2000-char tail-capture budget;
* the contention flag is the median per-query inflation over the FULL
  shared set — a synthetic broad-band slow window must flag, a
  single-query regression must not, and an improvement run must not.

And the operator-side r14 changes:
* AQE applies inside cached-plan execution (the bounded-round label
  propagation win) — pinned on both session entry points;
* stateful_sessions replays in exactly ONE micro-batch (VERDICT r13
  directive 5 measured it as already-single; this keeps it that way);
* a sub-32 SPARK_GRAFT_LIST_THRESHOLD can force distributed listing
  for small path sets (ADVICE r13).
"""

from __future__ import annotations

import json
import os

import bench


def test_contention_flags_broad_band_window():
    # the r13 failure mode: EVERY query ~40% slow (host interference) —
    # the old fixed-quartet check missed it when the growth landed
    # outside the four markers; the median statistic cannot
    prev = {f"q{i}": 1.0 for i in range(53)}
    now = {n: 1.4 for n in prev}
    shared, med = bench.compare_to_prev(now, prev)
    assert shared == {"now": round(53 * 1.4, 3), "prev": 53.0, "n_shared": 53}
    assert med is not None and med > bench.CONTENTION_MEDIAN_INFLATION


def test_single_query_regression_does_not_read_as_contention():
    # a real regression concentrates in the touched query; the run must
    # NOT be dismissed as contended (the number must stay readable)
    prev = {f"q{i}": 1.0 for i in range(53)}
    now = dict(prev)
    now["q7"] = 5.0
    _, med = bench.compare_to_prev(now, prev)
    assert med is not None and med <= bench.CONTENTION_MEDIAN_INFLATION


def test_improvement_run_is_clean_and_new_queries_are_excluded():
    prev = {f"q{i}": 1.0 for i in range(10)}
    now = {n: 0.8 for n in prev}
    now["brand_new_query"] = 9.9  # not in prev: excluded from the diff
    shared, med = bench.compare_to_prev(now, prev)
    assert shared is not None and shared["n_shared"] == 10
    assert shared["now"] == 8.0 and shared["prev"] == 10.0
    assert med is not None and med < 1.0


def test_no_previous_detail_yields_no_flag_inputs():
    assert bench.compare_to_prev({"q": 1.0}, {}) == (None, None)


def test_headline_line_fits_the_tail_capture_budget():
    # the driver's tail window is ~2000 chars; the LAST line must never
    # push its own opening brace out (the BENCH_r05 truncation). Build
    # the line exactly as main() does, with worst-ish-case widths.
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 999.999,
            "unit": "sec",
            "sf": 0.1,
            "runs": 3,
            "n_queries": len(bench.HEADLINE),
            "queries": {n: 99.99 for n in bench.HEADLINE},
            "cold_total": 999.999,
            "steady_above_cold_anomalies": [],
            "shared_total_vs_prev": {
                "now": 999.999,
                "prev": 999.999,
                "n_shared": len(bench.HEADLINE),
            },
            "contended_run": False,
            "median_inflation_vs_prev": 1.001,
            "scale_smoke": "pass",
            "scale_ratio_max": 12.34,
        }
    )
    assert len(line) < 1900, len(line)


def test_cached_plans_run_with_aqe(spark):
    # the per-round persisted label frames must execute under AQE
    # (coalesced shuffles) — the default disables AQE inside cached-plan
    # execution, which ran every propagation round's shuffle at the full
    # static partition count at any scale (see session.py)
    from trail_condition_etl_spark.session import ensure_engine_conf

    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    assert spark.conf.get(key) == "true"  # builder path (get_spark)
    spark.conf.set(key, "false")
    ensure_engine_conf(spark)  # driver-session path re-pins it
    assert spark.conf.get(key) == "true"


def test_stateful_sessions_replays_in_one_micro_batch(spark, monkeypatch):
    # availableNow over the single-file staged input commits exactly one
    # micro-batch — a staging change that splits the input into many
    # files would silently multiply stream fixed costs per batch
    import glob

    from trail_condition_etl_spark.operators import artifacts
    from trail_condition_etl_spark.streaming.stateful import (
        stateful_sessions_query,
    )

    made: list[str] = []
    orig = artifacts.scratch_dir

    def spy(prefix: str) -> str:
        p = orig(prefix)
        made.append(p)
        return p

    monkeypatch.setattr(artifacts, "scratch_dir", spy)
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    stateful_sessions_query(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    run_root = [p for p in made if "stateful_sessions_" in p][-1]
    commits = [
        p
        for p in glob.glob(os.path.join(run_root, "ckpt", "commits", "*"))
        if not os.path.basename(p).startswith(".")
    ]
    assert len(commits) == 1, commits


def test_spine_family_and_revenue_share_scan_the_fact_once(spark):
    # r14: the date-spine operators fused the bounds+join into one pass
    # (timeseries.filled_days) and revenue_share persists its bounded
    # per-nation frame — each used to re-scan + re-aggregate the fact
    # per consumer subtree (2-3 full fact passes at any scale)
    from trail_condition_etl_spark import plans, registry

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    qs = registry.queries()
    for name, token in [
        ("gap_fill", "events.parquet"),
        ("ewma_daily", "events.parquet"),
        ("linear_interp", "events.parquet"),
        ("revenue_share", "orders.parquet"),
    ]:
        df = qs[name](spark, sf)
        assert plans.count_scans_of(df, token) == 1, name


def test_sub32_listing_override_still_reads_small_path_sets(
    spark, tmp_path, monkeypatch
):
    # ADVICE r13: an env threshold below 32 used to be ignored for small
    # path sets (the short-circuit compared against the literal 32);
    # with the override honored, a 2-path read must still return every
    # row through the distributed-listing branch
    from pyspark.sql import functions as F

    from trail_condition_etl_spark.sinks import manifest as mf

    root = str(tmp_path / "two")
    spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("b")
    ).write.partitionBy("b").parquet(root)
    dirs = sorted(
        os.path.join(root, d) for d in os.listdir(root) if d.startswith("b=")
    )
    assert len(dirs) == 2
    monkeypatch.setenv("SPARK_GRAFT_LIST_THRESHOLD", "1")
    key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    before = spark.conf.get(key)
    assert mf._read_parquet_paths(spark, "id long", dirs).count() == 10
    assert spark.conf.get(key) == before
