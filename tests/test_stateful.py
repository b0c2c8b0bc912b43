"""applyInPandasWithState sessionization: multi-batch state carry,
gap-close semantics, and parity with the batch sessionize operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trail_condition_etl_spark.streaming import stateful

T0 = dt.datetime(2026, 3, 1, 12, 0, 0)


def _m(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def _run_batches(spark, tmp_path, batches, timeout=None):
    """Stage each batch as its own file and process them in order
    (maxFilesPerTrigger=1 under AvailableNow), collecting every emitted
    closed session."""
    import time

    staging = tmp_path / "staging"
    out = tmp_path / "out"
    for i, rows in enumerate(batches):
        _events(spark, rows).coalesce(1).write.mode("append").parquet(str(staging))
        time.sleep(0.05)  # distinct mtimes -> deterministic file order
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).option("maxFilesPerTrigger", 1).parquet(str(staging))
    kwargs = {} if timeout is None else {"timeout": timeout}
    q = (
        stateful.sessionize_stream(stream, **kwargs)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(str(out)).collect()


def test_state_carries_across_batches_and_gap_closes(spark, tmp_path):
    # user 7: batch-1 events 12:00 + 12:10 (one session), batch-2 event
    # 13:30 (> 30 min gap -> closes the stored session with BOTH events);
    # user 8: batch-1 event 12:00, batch-2 event 12:20 (within gap ->
    # merges into open state, nothing emitted).
    rows = _run_batches(
        spark,
        tmp_path,
        [
            [(1, _m(0), 7, 1.25), (2, _m(10), 7, 2.50), (10, _m(0), 8, 9.0)],
            [(3, _m(90), 7, 4.00), (11, _m(20), 8, 1.0)],
        ],
    )
    assert len(rows) == 1
    s = rows[0]
    assert s.user_id == 7
    assert s.session_start == _m(0) and s.session_end == _m(10)
    assert s.n_events == 2
    assert s.session_value == 3.75


def test_single_batch_emits_all_but_trailing_session(spark, tmp_path):
    # 3 sessions for one user in one batch -> first 2 emitted, last open
    rows = _run_batches(
        spark,
        tmp_path,
        [
            [
                (1, _m(0), 1, 1.0),
                (2, _m(5), 1, 1.0),
                (3, _m(60), 1, 2.0),
                (4, _m(150), 1, 3.0),
            ]
        ],
    )
    got = sorted((r.session_start, r.n_events, r.session_value) for r in rows)
    assert got == [(_m(0), 2, 2.0), (_m(60), 1, 2.0)]


def test_parity_with_batch_sessionize(spark, tmp_path):
    """Closed sessions from the stream == batch sessions minus each
    user's trailing session, on real sf0.001 events."""
    from trail_condition_etl_spark import catalog
    from trail_condition_etl_spark.operators import relational

    events = catalog.load_table(spark, "/root/testdata/sf0.001", "events")
    batch = relational.sessionize(events)
    w_last = F.max("session_seq").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
            "user_id"
        )
    )
    expected = (
        batch.withColumn("last_seq", w_last)
        .filter(F.col("session_seq") < F.col("last_seq"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_events").alias("ev"),
        )
        .collect()[0]
    )

    streamed = stateful.stateful_sessions_query(spark, "/root/testdata/sf0.001")
    got = streamed.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("ev")
    ).collect()[0]
    assert (got.n, got.ev) == (expected.n, expected.ev)


# --- newest-operator semantics (oracle parity alone can't explain) -----


def test_linear_fit_recovers_known_slope(spark):
    import datetime as dt

    from trail_condition_etl_spark.operators import relational

    t0 = dt.datetime(2024, 1, 1)
    # value = 10 + 2.5 * day  (exact in cents)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "view", 10.0 + 2.5 * i)
        for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    [r] = relational.linear_fit(ev).collect()
    assert r.slope_per_day == 2.5
    assert r.intercept == 10.0
    assert r.r2 == 1.0


def test_anomaly_flags_bounds(spark):
    from trail_condition_etl_spark import catalog
    from trail_condition_etl_spark.operators import relational
    from conftest import SF_DIR

    events = catalog.load_table(spark, SF_DIR, "events")
    for r in relational.anomaly_flags(events).collect():
        assert 0 <= r.n_anomalies <= r.n
        assert r.max_abs_z >= 0


def test_pagerank_isolated_doc_keeps_teleport_mass_only(spark):
    from trail_condition_etl_spark import catalog
    from trail_condition_etl_spark.operators import dedup
    from conftest import SF_DIR

    docs = catalog.load_table(spark, SF_DIR, "documents")
    ranks = {r.doc_id: r.rank_micro for r in dedup.near_dup_pagerank(docs).collect()}
    edges = dedup.minhash_pairs(docs).select("doc_a", "doc_b").collect()
    linked = {e.doc_a for e in edges} | {e.doc_b for e in edges}
    isolated = set(ranks) - linked
    assert isolated, "corpus should contain isolated docs"
    # teleport-only mass for isolated docs; every rank at least teleport
    assert all(ranks[d] == 150_000 for d in isolated)
    assert all(v >= 150_000 for v in ranks.values())
    # linked docs accumulate more than teleport mass
    assert any(ranks[d] > 150_000 for d in linked)
