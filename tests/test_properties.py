"""Property-based tests (hypothesis): invariants the golden-output
oracle can't express — they must hold for EVERY input, not just the
driver's parquet. Each example batches its generated rows into a single
Spark job so the suite stays fast."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from trail_condition_etl_spark.operators.pipeline import (
    EXPIRED_TASK_SECONDS,
    MAX_DELIVERY_COUNT,
)
from trail_condition_etl_spark.operators import relational
from trail_condition_etl_spark.sinks import upsert
from trail_condition_etl_spark.streaming import pipeline as streaming_pipeline

T0 = dt.datetime(2026, 3, 1, 0, 0, 0)
GAP_S = 1800

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# offsets in seconds over a 2-day span; duplicates allowed
offsets = st.lists(
    st.integers(min_value=0, max_value=2 * 86400), min_size=1, max_size=60
)


@given(offs=offsets)
@SETTINGS
def test_sessionize_partitions_events_and_respects_gap(spark, offs):
    rows = [
        (i, T0 + dt.timedelta(seconds=s), 1, 1.0)
        for i, s in enumerate(sorted(offs))
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    sessions = relational.sessionize(events, gap_minutes=30).collect()
    # partition: every event is in exactly one session
    assert sum(s.n_events for s in sessions) == len(rows)
    # per-session duration is consistent with the gap bound
    for s in sessions:
        assert s.duration_s <= (s.n_events - 1) * GAP_S
    # consecutive sessions are separated by > gap: reconstruct boundaries
    secs = sorted(set(offs))
    n_expected = 1 + sum(
        1 for a, b in zip(secs, secs[1:]) if b - a > GAP_S
    )
    assert len(sessions) == n_expected


@given(
    dcs=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
    ages=st.lists(
        st.integers(min_value=0, max_value=3 * 86400), min_size=1, max_size=40
    ),
)
@SETTINGS
def test_envelope_routing_policy_total_and_exclusive(spark, dcs, ages):
    n = min(len(dcs), len(ages))
    now = T0 + dt.timedelta(days=4)
    rows = [
        (f"t-{i}", i, now - dt.timedelta(seconds=ages[i]), dcs[i])
        for i in range(n)
    ]
    tasks = spark.createDataFrame(
        rows, "task_id string, city_id int, _enqueued_ts timestamp, _delivery_count int"
    )
    routed = streaming_pipeline.route_envelope(tasks, now=F.lit(now)).collect()
    assert len(routed) == n  # total: every task gets exactly one route
    for r in routed:
        i = int(r.task_id.split("-")[1])
        if dcs[i] > MAX_DELIVERY_COUNT:
            assert r.route == "dlq_poison"  # poison wins over expiry
        elif ages[i] > EXPIRED_TASK_SECONDS:
            assert r.route == "dlq_expired"
        else:
            assert r.route == "process"


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=20
    ),
)
@SETTINGS
def test_upsert_is_idempotent_and_last_writer_wins(spark, tmp_path_factory, keys):
    table = str(tmp_path_factory.mktemp("prop_upsert") / "t")
    base = spark.createDataFrame(
        [(k, f"v0-{k}") for k in set(keys)], "id int, val string"
    )
    upsert.upsert_parquet(spark, table, base, ["id"])
    update = spark.createDataFrame(
        [(k, f"v1-{k}") for k in keys], "id int, val string"
    ).dropDuplicates(["id"])
    upsert.upsert_parquet(spark, table, update, ["id"])
    once = sorted(map(tuple, upsert.read_upsert_table(spark, table).collect()))
    # replaying the SAME batch (crash-recovery redelivery) changes nothing
    upsert.upsert_parquet(spark, table, update, ["id"])
    twice = sorted(map(tuple, upsert.read_upsert_table(spark, table).collect()))
    assert once == twice
    assert once == sorted((k, f"v1-{k}") for k in set(keys))


# printable-ASCII token domain — the documented domain of the cross-engine
# hash (documents are ASCII; ascii()/unicode() parity beyond BMP is not
# part of the contract)
ascii_tokens = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=30,
)


@given(toks=ascii_tokens)
@SETTINGS
def test_char_poly_hash_agrees_with_duckdb_for_any_string(spark, toks):
    """EVERY oracle built on operators/hashing.py rests on this: the
    Spark Horner fold and the DuckDB SQL fold produce the same id for
    the same string."""
    import duckdb

    from trail_condition_etl_spark.operators import hashing

    strings = sorted(set(" ".join(toks).split(" ")))
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r.s: r.h
        for r in df.select("s", hashing.char_poly_hash("s").alias("h")).collect()
    }
    con = duckdb.connect()
    expr = hashing.char_poly_hash_sql("s")
    want = dict(
        con.execute(
            f"SELECT s, {expr} AS h FROM (SELECT unnest(?) AS s)", [strings]
        ).fetchall()
    )
    assert got == want


@given(toks=ascii_tokens)
@SETTINGS
def test_word_ngrams_agree_with_duckdb_including_short_docs(spark, toks):
    """The n-gram builders must agree for every token count — including
    docs shorter than n, where Spark's sequence(1, k<1) would silently
    yield [1, 0] without the guard and DuckDB's range() is empty."""
    import duckdb

    from trail_condition_etl_spark.operators import curation

    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(curation._word_ngrams(5).alias("g")).collect()[0].g
    con = duckdb.connect()
    sql = curation._ngrams_sql(5)
    want = con.execute(
        f"SELECT {sql} FROM (SELECT string_split(?, ' ') AS toks)", [text]
    ).fetchone()[0]
    assert list(got) == list(want)
    if len(toks) < 5:
        assert got == []
    else:
        assert len(got) == len(toks) - 4


# ---------------------------------------------------------------------------
# SCD2 invariants: for ANY event sequence the intervals must tile the
# timeline per user with no overlaps, alternating types, one open tail
# ---------------------------------------------------------------------------

event_seqs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=86400),      # ts offset seconds
        st.sampled_from(["a", "b", "c"]),               # event type
    ),
    min_size=1,
    max_size=40,
)


@given(seq=event_seqs)
@SETTINGS
def test_scd2_intervals_tile_the_timeline(spark, seq):
    from trail_condition_etl_spark.operators import warehouse

    rows = [
        (i, T0 + dt.timedelta(seconds=off), 1, etype)
        for i, (off, etype) in enumerate(seq)
    ]
    events = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING"
    )
    out = sorted(
        (r.valid_from, r.valid_to, r.event_type, r.is_current)
        for r in warehouse.scd2_build(events).collect()
    )
    assert out, "at least one interval"
    # exactly one open interval, and it is the last
    assert sum(1 for r in out if r[3]) == 1 and out[-1][3]
    assert out[-1][1] == "9999-12-31"
    # contiguity + alternation
    for (vf, vt, et, cur), (vf2, vt2, et2, cur2) in zip(out, out[1:]):
        assert vt == vf2, "intervals must be contiguous"
        assert et != et2, "adjacent regimes must differ in type"


@given(seq=event_seqs)
@SETTINGS
def test_gap_fill_spine_is_complete_and_filled(spark, seq):
    from trail_condition_etl_spark.operators import behavior

    rows = [
        (i, T0 + dt.timedelta(seconds=off * 30), 1, "click", float(i % 7))
        for i, (off, _) in enumerate(seq)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE",
    )
    out = sorted(
        (r.day, r.is_filled, r.value_sum)
        for r in behavior.gap_fill_daily(events).collect()
    )
    days = [d for d, _, _ in out]
    assert days == sorted(set(days)), "one row per day, ordered"
    assert len(days) >= 1
    # after the first (observed) day, value_sum is never null
    assert out[0][1] is False
    assert all(v is not None for _, _, v in out)


@given(seq=event_seqs)
@SETTINGS
def test_funnel_counts_partition_viewing_users(spark, seq):
    from trail_condition_etl_spark.operators import behavior

    types = {"a": "view", "b": "click", "c": "purchase"}
    rows = [
        (i, T0 + dt.timedelta(seconds=off), (i % 3) + 1, types[et], 1.0)
        for i, (off, et) in enumerate(seq)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE",
    )
    out = {r.funnel_depth: r.n_users for r in behavior.conversion_funnel(events).collect()}
    assert set(out) <= {1, 2, 3}
    viewers = len({u for _, _, u, et, _ in rows if et == "view"})
    assert sum(out.values()) == viewers


@given(seq=event_seqs)
@SETTINGS
def test_cohort_triangle_invariants(spark, seq):
    from trail_condition_etl_spark.operators import behavior

    rows = [
        (i, T0 + dt.timedelta(seconds=off * 50), (i % 4) + 1, "view", 1.0)
        for i, (off, _) in enumerate(seq)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE",
    )
    cells = behavior.retention_cohorts(events).collect()
    assert all(r.offset_days >= 0 for r in cells)
    day0 = {r.cohort_day: r.n_users for r in cells if r.offset_days == 0}
    users = len({u for _, _, u, _, _ in rows})
    # every user is active on their own first day, so the offset-0
    # column partitions the user set
    assert sum(day0.values()) == users
    for r in cells:
        assert r.n_users <= day0[r.cohort_day]


# --- time-series kit invariants (operators/timeseries.py) ---------------

ts_offsets = st.lists(
    st.integers(min_value=0, max_value=10 * 86400), min_size=1, max_size=40
)


@given(offs=ts_offsets)
@SETTINGS
def test_peak_concurrency_bounds(spark, offs):
    from trail_condition_etl_spark.operators import timeseries

    rows = [
        (i, T0 + dt.timedelta(seconds=s), i % 3, "view", 1.0)
        for i, s in enumerate(offs)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = timeseries.peak_concurrency(ev).collect()
    per_user = {}
    for _, t, u, _, _ in rows:
        per_user.setdefault(u, []).append(t)
    for r in got:
        n = len(per_user[r.user_id])
        # peak is within [1, n_sessions]; session count preserved
        assert 1 <= r.peak_concurrent <= n
        assert r.n_sessions == n
        # brute-force peak at the start instants must agree
        times = per_user[r.user_id]
        brute = max(
            sum(
                1
                for t2 in times
                if t2 <= t1 < t2 + dt.timedelta(seconds=timeseries.SESSION_SECONDS)
            )
            for t1 in times
        )
        assert r.peak_concurrent == brute


@given(offs=ts_offsets)
@SETTINGS
def test_streaks_partition_active_days(spark, offs):
    from trail_condition_etl_spark.operators import timeseries

    rows = [
        (i, T0 + dt.timedelta(seconds=s), 1, "view", 1.0)
        for i, s in enumerate(offs)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    [r] = timeseries.activity_streaks(ev).collect()
    days = sorted({(T0 + dt.timedelta(seconds=s)).date() for s in offs})
    assert r.n_active_days == len(days)
    # longest streak computed brute-force
    best = cur = 1
    for a, b in zip(days, days[1:]):
        cur = cur + 1 if (b - a).days == 1 else 1
        best = max(best, cur)
    assert r.longest_streak == best
    # streak lengths sum to the active-day count
    assert r.n_streaks >= 1


# word lists for paragraph-dedup docs: small vocab so duplicate
# paragraphs actually occur
para_docs = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=1,
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


@given(docs=para_docs)
@SETTINGS
def test_paragraph_dedup_conserves_and_bounds(spark, docs):
    """For ANY corpus: sum(n_paras) equals the total paragraph windows
    of all docs; 0 <= n_dropped < n_paras per source (the first
    occurrence of every distinct paragraph always survives); and a
    corpus with all-distinct docs of unique tokens drops nothing."""
    from trail_condition_etl_spark.operators import dedup

    rows = [(i, " ".join(words), f"src{i % 3}") for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rep = dedup.paragraph_dedup_report(df).collect()
    expected_paras = sum(
        (len(words) - 1) // dedup.PARA_TOKENS + 1 for words in docs
    )
    assert sum(r.n_paras for r in rep) == expected_paras
    for r in rep:
        assert 0 <= r.n_dropped <= r.n_paras
    # at least one paragraph survives globally
    assert sum(r.n_paras - r.n_dropped for r in rep) >= 1


# change batches for the manifest MERGE model test: each batch is a
# list of (key, value, deleted) — small key space so updates, deletes
# of absent keys, and within-batch duplicates all actually occur
merge_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.sampled_from(["a", "b", "c"]),
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@given(batches=merge_batches)
@SETTINGS
def test_manifest_merge_matches_dict_model(spark, tmp_path_factory, batches):
    """Model-based MERGE semantics: ANY sequence of change batches
    (inserts, updates, tombstone deletes, deletes of absent keys,
    within-batch duplicate keys) applied through manifest_upsert ends in
    the same state as the obvious dict model, every intermediate version
    stays time-travel readable, and versions number 1..n."""
    from trail_condition_etl_spark.sinks import manifest as mfmt

    table = str(tmp_path_factory.mktemp("mf") / "t")
    model: dict[int, str] = {}
    snapshots = []
    for batch in batches:
        df = spark.createDataFrame(
            batch, "k int, v string, _deleted boolean"
        )
        mfmt.manifest_upsert(
            spark, table, df, ["k"], n_buckets=4, tombstone_col="_deleted"
        )
        # model: per key, the batch's FIRST row wins (dropDuplicates
        # keeps one arbitrary row; the engine's choice only matters when
        # a key repeats with DIFFERENT payloads, which we avoid asserting
        # on by checking key sets there); deletes beat upserts on a key
        dead = {k for k, _v, d in batch if d}
        live = {}
        for k, v, d in batch:
            if not d and k not in live:
                live[k] = v
        for k in set(dead) | set(live):
            model.pop(k, None)
        for k, v in live.items():
            if k not in dead:
                model[k] = v
        snapshots.append(dict(model))
    assert mfmt.list_versions(table) == list(range(1, len(batches) + 1))
    for version, snap in enumerate(snapshots, start=1):
        got = {
            r.k: r.v
            for r in mfmt.read_manifest_table(spark, table, version).collect()
        }
        ambiguous = {
            k
            for batch in batches[:version]
            for k, _v, d in batch
            if not d and sum(1 for k2, _v2, d2 in batch if k2 == k and not d2) > 1
        }
        assert set(got) == set(snap)
        for k in set(snap) - ambiguous:
            assert got[k] == snap[k], (version, k)


@given(n=st.integers(min_value=1, max_value=6))
@SETTINGS
def test_lease_tokens_strictly_increase(tmp_path_factory, n):
    """Fencing tokens are strictly monotone across any acquire/release
    sequence — the property the stale-writer detection rests on."""
    from trail_condition_etl_spark.sinks import upsert as u

    table = str(tmp_path_factory.mktemp("lease") / "t")
    tokens = []
    for _ in range(n):
        tokens.append(u.acquire_table_lease(table))
        u.release_table_lease(table)
    assert tokens == sorted(set(tokens))
    assert tokens[0] >= 1 and tokens[-1] == tokens[0] + n - 1


# ---------------------------------------------------------------------------
# model-based manifest table: any op sequence vs an in-memory dict
# ---------------------------------------------------------------------------

_mops = st.lists(
    st.one_of(
        st.tuples(
            st.just("upsert"),
            st.dictionaries(
                st.integers(0, 30), st.integers(-100, 100),
                min_size=1, max_size=6,
            ),
        ),
        st.tuples(
            st.just("delete"),
            st.sets(st.integers(0, 30), min_size=1, max_size=4),
        ),
        st.tuples(
            st.just("mor_delete"),
            st.sets(st.integers(0, 30), min_size=1, max_size=4),
        ),
        st.tuples(
            st.just("update"),
            st.sets(st.integers(0, 30), min_size=1, max_size=4),
        ),
        st.tuples(st.just("optimize"), st.booleans()),
        st.tuples(st.just("vacuum"), st.just(None)),
        # bucket-layout evolution mid-sequence: 8 is aligned with the
        # creation layout (4), 6 is not — both must be state-preserving
        st.tuples(st.just("rescale"), st.sampled_from([6, 8])),
        # byte-policy maintenance: may or may not trigger a rescale at
        # this tiny ceiling; either way the state must be untouched
        st.tuples(st.just("maintain"), st.just(None)),
        # metadata-only RENAME COLUMN (column mapping): flips the value
        # column's logical name mid-sequence — every later op, read
        # path, optimize-normalize, and the CDC replay must follow it
        st.tuples(st.just("rename"), st.just(None)),
        # incremental bucket-wise compaction (r10): must be
        # state-preserving like optimize — materializes pending MoR
        # deletes for the buckets it touches, carries the rest by path
        st.tuples(st.just("compact"), st.just(None)),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=_mops, sharded=st.booleans())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_manifest_table_matches_model_under_any_op_sequence(
    spark, tmp_path_factory, ops, sharded
):
    """Model-based check: ANY interleaving of upserts, tombstone
    deletes, merge-on-read deletes, updates (each including absent
    keys), plain/clustered optimizes, and vacuums leaves the table
    exactly equal to a dict that applied the same ops — and the
    stats-skip read, the metadata-only count, the Python DataSource
    batch read, and a CDC-replay reconstruction (oldest snapshot +
    change feed) all agree with the model too. Half the examples run
    with SIDECAR_RANGE forced to 2 (r11): the sharded metadata layout
    must be invisible to every one of those surfaces."""
    from trail_condition_etl_spark.sinks import manifest as mfm

    prev_range = mfm.SIDECAR_RANGE
    if sharded:
        mfm.SIDECAR_RANGE = 2
    try:
        _run_manifest_model(spark, tmp_path_factory, ops)
    finally:
        mfm.SIDECAR_RANGE = prev_range


def _run_manifest_model(spark, tmp_path_factory, ops):
    from trail_condition_etl_spark.sinks import manifest as mfm

    table = str(tmp_path_factory.mktemp("prop_manifest") / "t")
    model: dict[int, int] = {}
    committed = False
    vc = "v"  # the value column's CURRENT logical name (rename flips it)
    for kind, arg in ops:
        if kind == "upsert":
            df = spark.createDataFrame(
                list(arg.items()), f"k int, {vc} long"
            )
            # n_buckets only on the CREATING commit: after a rescale
            # the table's layout may differ, and pinning 4 on every
            # upsert trips the layout-contradiction guard (the r9
            # falsifying sequence was `upsert; rescale 6; upsert`)
            mfm.manifest_upsert(
                spark, table, df, ["k"],
                n_buckets=None if committed else 4,
            )
            model.update(arg)
            committed = True
        elif kind == "delete" and committed:
            df = spark.createDataFrame(
                [(k, True) for k in arg], "k int, _gone boolean"
            )
            mfm.manifest_upsert(
                spark, table, df, ["k"], tombstone_col="_gone"
            )
            for k in arg:
                model.pop(k, None)
        elif kind == "mor_delete" and committed:
            # merge-on-read path: equality-delete files, no rewrite
            mfm.delete_where(spark, table, F.col("k").isin(sorted(arg)))
            for k in arg:
                model.pop(k, None)
        elif kind == "update" and committed:
            mfm.update_where(
                spark,
                table,
                F.col("k").isin(sorted(arg)),
                {vc: F.col(vc) + F.lit(1000)},
            )
            for k in arg:
                if k in model:
                    model[k] += 1000
        elif kind == "optimize" and committed:
            mfm.optimize_table(
                spark,
                table,
                cluster_by=[vc] if arg else None,
                files_per_bucket=2,
            )
        elif kind == "rescale" and committed:
            mfm.optimize_table(spark, table, n_buckets=arg)
        elif kind == "maintain" and committed:
            mfm.maintain_table(spark, table, max_bucket_bytes=4096)
        elif kind == "rename" and committed:
            new_vc = "v_r" if vc == "v" else "v"
            mfm.rename_column(spark, table, vc, new_vc)
            vc = new_vc
        elif kind == "compact" and committed:
            mfm.compact_buckets(spark, table)
        elif kind == "vacuum" and committed:
            mfm.vacuum(table, keep_last=1)
    if not committed:
        return
    got = {
        r.k: getattr(r, vc)
        for r in mfm.read_manifest_table(spark, table).collect()
    }
    assert got == model
    assert mfm.manifest_row_count(table) == len(model)
    # r13 delta-commit invariant: the incrementally-maintained agg
    # scalars must equal a from-scratch recompute over the assembled
    # maps after ANY op interleaving (general and delta commits mix
    # freely — optimize/restore recompute, upsert/delete increment)
    latest = mfm.list_versions(table)[-1]
    slim = mfm._read_slim(table, latest)
    if "agg" in slim:
        assert slim["agg"] == mfm._bucket_agg(
            mfm.read_manifest(table, latest)
        ), "incremental agg drifted from recompute"
    skipped = mfm.read_manifest_table(spark, table, skip=[(vc, ">=", 0)])
    assert {r.k: getattr(r, vc) for r in skipped.collect()} == {
        k: v for k, v in model.items() if v >= 0
    }
    # every read path agrees: the Python DataSource batch reader must
    # see the same state (incl. pending MoR deletes) as the library read
    from trail_condition_etl_spark.sources.manifest_source import (
        register_manifest_sources,
    )

    register_manifest_sources(spark)
    ds = {
        r.k: getattr(r, vc)
        for r in spark.read.format("manifest")
        .option("path", table)
        .load()
        .collect()
    }
    assert ds == model
    # point-lookup path (driver-side bucket planning) agrees too, for a
    # mix of present and absent keys
    probe = sorted(set(list(model)[:3] + [97, 98]))
    looked = {
        r.k: getattr(r, vc)
        for r in mfm.read_manifest_lookup(
            spark, table, [{"k": k} for k in probe]
        ).collect()
    }
    assert looked == {k: model[k] for k in probe if k in model}
    # CDC replay invariant: applying table_changes(oldest -> latest)
    # onto the oldest retained snapshot reconstructs the latest exactly
    versions = mfm.list_versions(table)
    if versions[-1] > versions[0]:
        base_v = versions[0]
        feed = mfm.table_changes(spark, table, base_v).collect()
        replay = str(tmp_path_factory.mktemp("prop_replay") / "t")
        base_df = mfm.read_manifest_table(spark, table, version=base_v)
        # a rename after base_v leaves the old snapshot under the old
        # logical name; a real CDC consumer applies the rename DDL to
        # its replica before replaying the feed — do the same here
        old_vc = [c for c in base_df.columns if c != "k"][0]
        if old_vc != vc:
            base_df = base_df.withColumnRenamed(old_vc, vc)
        mfm.manifest_upsert(spark, replay, base_df, ["k"], n_buckets=4)
        if feed:
            df = spark.createDataFrame(
                [
                    (r.k, getattr(r, vc), r.change_type == "delete")
                    for r in feed
                ],
                f"k int, {vc} long, _gone boolean",
            )
            mfm.manifest_upsert(spark, replay, df, ["k"], tombstone_col="_gone")
        got2 = {
            r.k: getattr(r, vc)
            for r in mfm.read_manifest_table(spark, replay).collect()
        }
        assert got2 == model
        # the STREAM reader's per-bucket diff (aligned-rescale path or
        # global fallback, depending on the sequence's rescales) must
        # emit exactly the library change feed over the same span
        import pyarrow as pa

        from trail_condition_etl_spark.sources import manifest_source as msrc

        stream_schema = msrc.cdc_schema(
            mfm._data_schema(mfm.read_manifest(table))
        )
        rdr = msrc.ManifestCDCStreamReader(stream_schema, {"path": table})
        parts = rdr.partitions(
            {"version": base_v}, {"version": versions[-1]}
        )
        streamed = {
            (row["k"], row[vc], row["change_type"])
            for p in parts
            for b in rdr.read(p)
            for row in pa.Table.from_batches([b]).to_pylist()
        }
        assert streamed == {
            (r.k, getattr(r, vc), r.change_type) for r in feed
        }


# ---------------------------------------------------------------------------
# two-writer model test (VERDICT r7 directive 5): random interleavings
# of ops from two writer identities with FORCED lease expiries between
# them — the model state must converge and no committed version may
# ever be lost (a crashed holder's late publish is fenced, never
# silently clobbers)
# ---------------------------------------------------------------------------

# deep mode (VERDICT r8 directive 7): the CI default (5 examples, <=7
# ops) keeps suite latency sane but is thin for a serialization
# protocol; SPARK_GRAFT_MODEL_EXAMPLES=50 runs the same model with more
# examples AND longer interleavings, the way the scale smoke is gated.
# Run once per round (documented in the verify skill).
import os as _os

_MODEL_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_MODEL_EXAMPLES", "5"))
_MODEL_MAX_OPS = 12 if _MODEL_EXAMPLES > 5 else 7

_w_ops = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.one_of(
            st.tuples(
                st.just("upsert"),
                st.dictionaries(
                    st.integers(0, 20), st.integers(-50, 50),
                    min_size=1, max_size=5,
                ),
            ),
            st.tuples(
                st.just("delete"),
                st.sets(st.integers(0, 20), min_size=1, max_size=3),
            ),
            st.tuples(
                st.just("update"),
                st.sets(st.integers(0, 20), min_size=1, max_size=3),
            ),
            st.tuples(st.just("optimize"), st.booleans()),
            st.tuples(st.just("maintain"), st.just(None)),
            # metadata-only RENAME COLUMN: interleaves with restores
            # (the mapping rolls back WITH the schema), optimizes (the
            # mapping normalizes away), fenced steals, and epochs
            st.tuples(st.just("rename"), st.just(None)),
            # incremental compaction racing the other writer's DML and
            # forged lease steals — state-preserving, versions intact
            st.tuples(st.just("compact"), st.just(None)),
            # RESTORE: the one manifest DML verb the model previously
            # never issued — a metadata-only rollback to a recorded
            # snapshot (the arg indexes into the snapshots taken so
            # far); the model state becomes that snapshot's dict
            st.tuples(st.just("restore"), st.integers(0, 1_000)),
            # stream epoch: txn-ledgered commit; a replayed/old epoch id
            # must raise and leave the state untouched
            st.tuples(
                st.just("epoch"),
                st.tuples(
                    st.integers(0, 2),
                    st.dictionaries(
                        st.integers(0, 20), st.integers(-50, 50),
                        min_size=1, max_size=4,
                    ),
                ),
            ),
            # r11 DDL alphabet (VERDICT r10 directive 3):
            # bloom index toggle on the value column — metadata + one
            # bounded backfill, bitmaps carried by reference on
            # untouched buckets, racing compaction and lease steals
            st.tuples(st.just("bloom"), st.just(None)),
            # add (additive evolution) / drop (tombstoned physical)
            # the extra column g; a re-add gets a fresh physical name
            st.tuples(
                st.just("colflip"),
                st.dictionaries(
                    st.integers(0, 20), st.integers(-50, 50),
                    min_size=1, max_size=4,
                ),
            ),
            # GENERATED ALWAYS AS toggle on g (rule = 2x the value
            # column): write-edge compute/validate racing everything
            st.tuples(st.just("genrule"), st.just(None)),
        ),
        st.booleans(),  # forge a crashed-writer lease before this op
    ),
    min_size=2,
    max_size=_MODEL_MAX_OPS,
)


def _forge_crashed_lease(table: str) -> bool:
    """Leave behind what a writer crashed mid-acquire leaves: the lock
    dir with a stale mtime and no heartbeat. The next legitimate op
    must STEAL it (age > TTL) instead of timing out."""
    import os
    import time

    lock = upsert._lock_dir(table)
    try:
        os.mkdir(lock)
    except FileExistsError:
        return False
    with open(os.path.join(lock, "owner"), "w") as f:
        f.write("0")
    old = time.time() - 3 * upsert.LOCK_LEASE_TTL_S
    os.utime(lock, (old, old))
    return True


def _fence_token(table: str) -> int:
    try:
        with open(upsert._fence_path(table)) as f:
            return int(f.read().strip() or "0")
    except (OSError, ValueError):
        return 0


@given(ops=_w_ops, sharded=st.booleans())
@settings(
    max_examples=_MODEL_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_two_writers_with_lease_steals_converge(
    spark, tmp_path_factory, ops, sharded
):
    """ANY interleaving of upsert/delete/update/optimize/maintain/
    rename/compact/restore/stream-epoch ops — plus the r11 DDL
    alphabet: bloom-index add/drop (bitmaps carried by reference),
    column add/drop/re-add (fresh physical name), and GENERATED ALWAYS
    AS add/drop (write-edge recompute) — issued by two writer
    identities with crashed leases forged between ops so the survivor
    must steal, ends with the table equal to the dict model (value AND
    g columns), versions contiguous 1..latest, every recorded
    intermediate version still time-travel readable (both columns), no
    bloom false negatives, and the crashed writer's stale fencing
    token REJECTED on its late publish attempt. Half the examples
    force the sharded metadata layout (SIDECAR_RANGE=2, r11)."""
    from trail_condition_etl_spark.sinks import manifest as mfm

    prev_range = mfm.SIDECAR_RANGE
    if sharded:
        mfm.SIDECAR_RANGE = 2
    try:
        _run_two_writer_model(spark, tmp_path_factory, ops)
    finally:
        mfm.SIDECAR_RANGE = prev_range


def _run_two_writer_model(spark, tmp_path_factory, ops):
    from trail_condition_etl_spark.sinks import manifest as mfm

    table = str(tmp_path_factory.mktemp("two_writers") / "t")
    model: dict[int, int] = {}
    mfm.manifest_upsert(
        spark, table, spark.createDataFrame([(0, 0)], "k int, v long"),
        ["k"], n_buckets=4,
    )
    model[0] = 0
    # g-column model: None = column absent; else {k: value-or-None}
    # (None entries are rows g never touched — they read NULL)
    gmodel = None
    rule_active = False  # GENERATED ALWAYS AS rule standing on g
    last_epoch: dict[str, int] = {}
    snapshots = [(mfm.read_manifest(table)["version"], dict(model), None)]
    stale_tokens = []

    def vcol() -> str:
        # the value column's CURRENT logical name: renames flip it and
        # restores roll it back, so derive it from the live manifest
        return next(
            f.name
            for f in mfm._data_schema(mfm.read_manifest(table)).fields
            if f.name not in ("k", "g")
        )

    for writer, (kind, arg), forge in ops:
        vc = vcol()
        if forge and _forge_crashed_lease(table):
            # the forged holder "crashed" holding a token no newer than
            # the current fence; its eventual publish must be fenced
            stale_tokens.append(_fence_token(table))
        if kind == "upsert":
            df = spark.createDataFrame(
                list(arg.items()), f"k int, {vc} long"
            )
            mfm.manifest_upsert(spark, table, df, ["k"])
            # upsert = whole-row replace: batch rows lose g (NULL)
            # unless the standing rule recomputes it at the write edge
            if rule_active:
                if gmodel is None:
                    gmodel = {k: None for k in model}
                for k, v2 in arg.items():
                    gmodel[k] = 2 * v2
            elif gmodel is not None:
                for k in arg:
                    gmodel[k] = None
            model.update(arg)
        elif kind == "delete":
            df = spark.createDataFrame(
                [(k, True) for k in arg], "k int, _gone boolean"
            )
            mfm.manifest_upsert(
                spark, table, df, ["k"], tombstone_col="_gone"
            )
            for k in arg:
                model.pop(k, None)
                if gmodel is not None:
                    gmodel.pop(k, None)
        elif kind == "update":
            mfm.update_where(
                spark, table, F.col("k").isin(sorted(arg)),
                {vc: F.col(vc) + F.lit(100)},
            )
            for k in arg:
                if k in model:
                    model[k] += 100
                    if rule_active:
                        gmodel[k] = 2 * model[k]
        elif kind == "optimize":
            mfm.optimize_table(
                spark, table, cluster_by=[vc] if arg else None
            )
        elif kind == "maintain":
            mfm.maintain_table(spark, table, max_bucket_bytes=4096)
        elif kind == "rename":
            try:
                mfm.rename_column(
                    spark, table, vc, "v_r" if vc == "v" else "v"
                )
            except ValueError:
                # the standing g-rule references vc: refusal is the
                # contract, state untouched
                assert rule_active
        elif kind == "compact":
            mfm.compact_buckets(spark, table)
        elif kind == "restore":
            tgt_v, tgt_model, tgt_gmodel = snapshots[arg % len(snapshots)]
            try:
                mfm.restore_table(spark, table, version=tgt_v)
            except ValueError:
                # carried g-rule does not resolve against the restored
                # schema (e.g. it names the other vc spelling): refusal
                # leaves the table untouched
                assert rule_active
            else:
                model = dict(tgt_model)
                gmodel = (
                    dict(tgt_gmodel) if tgt_gmodel is not None else None
                )
        elif kind == "bloom":
            mf_now = mfm.read_manifest(table)
            if mfm._physical_name(mf_now, vc) in mf_now.get("bloom", {}):
                mfm.drop_bloom_index(spark, table, vc)
            else:
                mfm.add_bloom_index(spark, table, vc, m=64, k=2)
        elif kind == "colflip":
            if gmodel is None:
                df = spark.createDataFrame(
                    [(k, v2, 2 * v2) for k, v2 in arg.items()],
                    f"k int, {vc} long, g long",
                )
                mfm.manifest_upsert(spark, table, df, ["k"])
                prev_keys = set(model)
                model.update(arg)
                gmodel = {k: None for k in prev_keys}
                gmodel.update({k: 2 * v2 for k, v2 in arg.items()})
            else:
                try:
                    mfm.drop_column(spark, table, "g")
                except ValueError:
                    assert rule_active  # rule depends on g: refused
                else:
                    gmodel = None
        elif kind == "genrule":
            if rule_active:
                mfm.drop_generated_column(spark, table, "g")
                rule_active = False
            elif gmodel is not None:
                # normalize g so every existing row satisfies the rule,
                # then record it (add validates the whole table first)
                mfm.update_where(
                    spark, table, F.lit(True),
                    {"g": (
                        F.coalesce(F.col(vc), F.lit(0)) * 2
                    ).cast("long")},
                )
                gmodel = {k: 2 * v2 for k, v2 in model.items()}
                mfm.add_generated_column(
                    spark, table, "g",
                    f"cast(coalesce({vc}, 0) * 2 as bigint)",
                )
                rule_active = True
        elif kind == "epoch":
            eid, batch = arg
            app = f"stream-{writer}"
            df = spark.createDataFrame(
                list(batch.items()), f"k int, {vc} long"
            )
            if app in last_epoch and eid <= last_epoch[app]:
                import pytest as _pt

                with _pt.raises(mfm.TxnAlreadyCommittedError):
                    mfm.manifest_upsert(
                        spark, table, df, ["k"], txn=(app, eid)
                    )
                # replay: state untouched
            else:
                mfm.manifest_upsert(
                    spark, table, df, ["k"], txn=(app, eid)
                )
                last_epoch[app] = eid
                if rule_active:
                    if gmodel is None:
                        gmodel = {k: None for k in model}
                    for k, v2 in batch.items():
                        gmodel[k] = 2 * v2
                elif gmodel is not None:
                    for k in batch:
                        gmodel[k] = None
                model.update(batch)
        v = mfm.read_manifest(table)["version"]
        if v != snapshots[-1][0]:
            snapshots.append((
                v, dict(model),
                dict(gmodel) if gmodel is not None else None,
            ))
    # convergence: final table state equals the model (the value
    # column reads under whatever logical name the sequence left)
    fin = mfm.read_manifest_table(spark, table)
    fvc = next(c for c in fin.columns if c not in ("k", "g"))
    frows = fin.collect()
    got = {r.k: getattr(r, fvc) for r in frows}
    assert got == model
    # the g column's state matches its own model (absent, or value /
    # NULL per row — rule recomputes, upserts null out, drops hide)
    if gmodel is None:
        assert "g" not in fin.columns
    else:
        assert {r.k: r.g for r in frows} == gmodel
    # a standing bloom index must never false-negative: probe one real
    # value (exact result) and one impossible value (zero files)
    if mfm.read_manifest(table).get("bloom") and model:
        tgt = next(iter(model.values()))
        probe = mfm.read_manifest_table(
            spark, table, skip=[(fvc, "=", tgt)]
        )
        assert {r.k: getattr(r, fvc) for r in probe.collect()} == {
            k: v2 for k, v2 in model.items() if v2 == tgt
        }
        assert mfm.read_manifest_table(
            spark, table, skip=[(fvc, "=", 10**6)]
        ).count() == 0
    # no committed version lost: contiguous 1..latest, all readable
    versions = mfm.list_versions(table)
    assert versions == list(range(1, versions[-1] + 1))
    for v, snap, gsnap in snapshots:
        tdf = mfm.read_manifest_table(spark, table, v)
        tvc = next(c for c in tdf.columns if c not in ("k", "g"))
        trows = tdf.collect()
        tv = {r.k: getattr(r, tvc) for r in trows}
        assert tv == snap, f"version {v} no longer matches its snapshot"
        if gsnap is not None:
            assert {r.k: r.g for r in trows} == gsnap, (
                f"version {v} g-column no longer matches its snapshot"
            )
    # the crashed writers' late publishes are all fenced
    for tok in stale_tokens:
        import pytest as _pt

        with _pt.raises(upsert.WriterFencedError):
            upsert.check_fence(table, tok)


# --- clone/vacuum lifecycle model ------------------------------------------
# The r10 transitive-pin fix's adversarial form: ANY interleaving of
# commits, chained clones, optimizes, releases, and vacuums must leave
# every live table reading exactly its model dict. Vacuum may REFUSE
# (VacuumRetentionError — the guard working), but a vacuum that
# SUCCEEDS must never break any table, no matter how deep the clone
# chain or which intermediate released first.

_clone_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("commit"),
            st.tuples(
                st.integers(0, 5),  # table index (mod live count)
                st.dictionaries(
                    st.integers(0, 15), st.integers(-9, 9),
                    min_size=1, max_size=4,
                ),
            ),
        ),
        st.tuples(st.just("clone"), st.integers(0, 5)),
        st.tuples(st.just("optimize"), st.integers(0, 5)),
        st.tuples(st.just("vacuum"), st.integers(0, 5)),
        st.tuples(st.just("release"), st.integers(0, 5)),
    ),
    min_size=2,
    max_size=_MODEL_MAX_OPS,
)


@given(ops=_clone_ops, sharded=st.booleans())
@settings(
    max_examples=_MODEL_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_clone_chains_survive_any_vacuum_interleaving(
    spark, tmp_path_factory, ops, sharded
):
    """Half the examples run with SIDECAR_RANGE forced to 2 (r12,
    VERDICT r11 directive 3): deep clone chains racing vacuums is
    exactly where a swept-but-still-carried sidecar would hide —
    clones carry the source's sidecar FILES by reference, and vacuum's
    `_meta/` sweep must honor those pins across any interleaving."""
    from trail_condition_etl_spark.sinks import manifest as mfm

    prev_range = mfm.SIDECAR_RANGE
    if sharded:
        mfm.SIDECAR_RANGE = 2
    try:
        _run_clone_model(spark, tmp_path_factory, ops)
    finally:
        mfm.SIDECAR_RANGE = prev_range


def _run_clone_model(spark, tmp_path_factory, ops):
    from trail_condition_etl_spark.sinks import manifest as mfm

    root = tmp_path_factory.mktemp("clone_model")
    tables: list[str] = [str(root / "t0")]
    models: list[dict[int, int]] = [{0: 0}]
    mfm.manifest_upsert(
        spark, tables[0],
        spark.createDataFrame([(0, 0)], "k int, v long"),
        ["k"], n_buckets=4,
    )
    for kind, arg in ops:
        if kind == "commit":
            idx, batch = arg
            i = idx % len(tables)
            mfm.manifest_upsert(
                spark, tables[i],
                spark.createDataFrame(list(batch.items()), "k int, v long"),
                ["k"],
            )
            models[i].update(batch)
        elif kind == "clone":
            i = arg % len(tables)
            dst = str(root / f"t{len(tables)}")
            mfm.clone_table(spark, tables[i], dst)
            tables.append(dst)
            models.append(dict(models[i]))
        elif kind == "optimize":
            i = arg % len(tables)
            mfm.optimize_table(spark, tables[i])
        elif kind == "vacuum":
            i = arg % len(tables)
            try:
                mfm.vacuum(tables[i], keep_last=1)
            except mfm.VacuumRetentionError:
                pass  # the guard refusing IS the contract
        elif kind == "release":
            # a release is only legitimate once the clone is SEVERED
            # (its newest manifest holds no absolute refs into others);
            # the model never breaks its own contract
            i = arg % len(tables)
            cmf = mfm.read_manifest(tables[i])
            refs = list(cmf["buckets"].values()) + [
                d for lst in cmf.get("deletes", {}).values() for d in lst
            ]
            if any(_os.path.isabs(d) for d in refs):
                continue
            for other in tables:
                if other != tables[i]:
                    mfm.release_clone(other, tables[i])
        # the lifecycle invariant: EVERY live table still reads exactly
        # its model — a succeeded vacuum never swept a dir anyone
        # reads. Checked after every sweep (the only op that removes
        # bytes) and once at the end for the DML/clone ops.
        if kind == "vacuum":
            for t, m in zip(tables, models):
                got = {
                    r.k: r.v
                    for r in mfm.read_manifest_table(spark, t).collect()
                }
                assert got == m, f"{t} diverged after {kind}"
    for t, m in zip(tables, models):
        got = {
            r.k: r.v for r in mfm.read_manifest_table(spark, t).collect()
        }
        assert got == m, f"{t} diverged at end"
