"""Sharded manifest metadata (r11, VERDICT r10 directive 2): past
SIDECAR_RANGE buckets the per-bucket maps (segment refs, stats, file
stats, row counts, delete refs, bloom bitmaps) shard into immutable
bucket-range sidecar files under `_meta/`, referenced by (path, hash)
from a slim manifest — Iceberg's manifest-list/manifest split reduced
to its mechanics.

THE scale property under test: a commit touching one bucket writes ONE
sidecar (its range) + the slim manifest, independent of n_buckets;
untouched ranges carry the previous version's file by reference, and
metadata-only commits rewrite zero sidecars. Readers assemble the
inline shape, so every probe/lookup/CDF/clone path is unchanged.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trail_condition_etl_spark.sinks import manifest as mfm


def _frame(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("tag"),
    )


def _one_key(spark, k: int, v: int):
    return spark.createDataFrame([(k, v, f"t{k}")], "k long, v long, tag string")


def _meta_files(table: str) -> set[str]:
    try:
        return set(os.listdir(os.path.join(table, "_meta")))
    except OSError:
        return set()


@pytest.fixture()
def small_range(monkeypatch):
    """Force sharding on tiny test tables (2 buckets per sidecar)."""
    monkeypatch.setattr(mfm, "SIDECAR_RANGE", 2)


def test_below_threshold_stays_inline(spark, tmp_path):
    t = str(tmp_path / "inline")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 40), ["k"], n_buckets=4)
    slim = mfm._read_slim(t, 1)
    assert "sidecars" not in slim and "buckets" in slim
    assert "sharded-metadata" not in slim["required_reader_features"]
    assert _meta_files(t) == set()


def test_sharded_layout_and_assembled_read(spark, tmp_path, small_range):
    t = str(tmp_path / "sharded")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 40), ["k"], n_buckets=4)
    slim = mfm._read_slim(t, 1)
    # slim manifest: no inline per-bucket maps, a 2-range sidecar index
    assert sorted(slim["sidecars"]) == ["0", "2"]
    for key in mfm._SIDECAR_KEYS:
        assert key not in slim
    assert "sharded-metadata" in slim["required_reader_features"]
    # assembled read restores the inline shape for every consumer
    mf = mfm.read_manifest(t)
    assert sorted(mf["buckets"]) == ["0", "1", "2", "3"]
    assert sorted(mf["stats"]) == ["0", "1", "2", "3"]
    got = {r.k: r.v for r in mfm.read_manifest_table(spark, t).collect()}
    assert len(got) == 40 and got[7] == 14


def test_one_bucket_commit_writes_one_sidecar(spark, tmp_path, small_range):
    """THE O(change) pin: a 1-key commit rewrites exactly ONE sidecar
    file however many ranges the table has — 2 ranges and 8 ranges
    both see one new file, the rest carried by reference."""
    for n_buckets, n_ranges in ((4, 2), (16, 8)):
        t = str(tmp_path / f"t{n_buckets}")
        mfm.manifest_upsert(
            spark, t, _frame(spark, 0, 80), ["k"], n_buckets=n_buckets
        )
        assert len(mfm._read_slim(t, 1)["sidecars"]) == n_ranges
        before = _meta_files(t)
        mfm.manifest_upsert(spark, t, _one_key(spark, 1, 999), ["k"])
        new = _meta_files(t) - before
        assert len(new) == 1, (n_buckets, sorted(new))
        s1 = mfm._read_slim(t, 1)["sidecars"]
        s2 = mfm._read_slim(t, 2)["sidecars"]
        carried = [lo for lo, e in s2.items() if e == s1.get(lo)]
        assert len(carried) == n_ranges - 1
        got = {r.k: r.v for r in mfm.read_manifest_table(spark, t).collect()}
        assert got[1] == 999 and len(got) == 80


def test_metadata_only_commit_rewrites_zero_sidecars(
    spark, tmp_path, small_range
):
    t = str(tmp_path / "meta_only")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 40), ["k"], n_buckets=4)
    before = _meta_files(t)
    mfm.rename_column(spark, t, "v", "val")
    mfm.add_table_constraint(spark, t, "val_even", "val % 2 = 0")
    assert _meta_files(t) == before  # two commits, zero sidecar bytes
    assert mfm.read_manifest_table(spark, t).filter(
        F.col("k") == 7
    ).head()["val"] == 14


def test_vacuum_sweeps_unreferenced_sidecars(spark, tmp_path, small_range):
    t = str(tmp_path / "vac")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 40), ["k"], n_buckets=4)
    for i in range(3):
        mfm.manifest_upsert(spark, t, _one_key(spark, i, 100 + i), ["k"])
    # an orphan from a "crashed commit"
    orphan = os.path.join(t, "_meta", "sc-99999999-00000000-deadbeef.json")
    with open(orphan, "w") as f:
        f.write("{}")
    mfm.vacuum(t, keep_last=2)
    left = _meta_files(t)
    referenced = set()
    for v in mfm.list_versions(t):
        for ent in mfm._read_slim(t, v)["sidecars"].values():
            referenced.add(os.path.basename(ent["path"]))
    assert left == referenced and "sc-99999999-00000000-deadbeef.json" not in left
    # both retained versions still read
    for v in mfm.list_versions(t):
        assert mfm.read_manifest_table(spark, t, version=v).count() == 40


def test_sharded_manifest_gates_old_readers(
    spark, tmp_path, small_range, monkeypatch
):
    """Forward-compat: a build without the sharded-metadata feature
    must refuse loudly — `mf.get("buckets", {})` consumers (vacuum's
    clone-pin check) would otherwise silently see an empty table."""
    t = str(tmp_path / "gate")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 10), ["k"], n_buckets=4)
    monkeypatch.setattr(
        mfm,
        "SUPPORTED_READER_FEATURES",
        mfm.SUPPORTED_READER_FEATURES - {"sharded-metadata"},
    )
    with pytest.raises(mfm.UnsupportedTableFeatureError, match="sharded"):
        mfm.read_manifest(t)


def test_real_threshold_shards_by_default(spark, tmp_path):
    """No patching: a table past the real SIDECAR_RANGE (65 buckets)
    shards, one below it (64) stays inline."""
    t = str(tmp_path / "big")
    mfm.manifest_upsert(
        spark, t, _frame(spark, 0, 200), ["k"],
        n_buckets=mfm.SIDECAR_RANGE + 1,
    )
    slim = mfm._read_slim(t, 1)
    assert "sidecars" in slim and len(slim["sidecars"]) == 2
    assert mfm.read_manifest_table(spark, t).count() == 200
    t2 = str(tmp_path / "small")
    mfm.manifest_upsert(
        spark, t2, _frame(spark, 0, 200), ["k"],
        n_buckets=mfm.SIDECAR_RANGE,
    )
    assert "sidecars" not in mfm._read_slim(t2, 1)


def test_lifecycle_parity_sharded_vs_inline(spark, tmp_path, small_range):
    """Differential: the same op sequence on a sharded table and an
    inline table (bucket layouts identical) must read identically at
    every step — sharding is a storage layout, never a semantics
    change. Covers upsert, MoR delete, update, bloom index + probe,
    clustered optimize, rescale across the threshold, restore, clone."""
    ts = str(tmp_path / "shard")
    ti = str(tmp_path / "inl")
    mfm.manifest_upsert(spark, ts, _frame(spark, 0, 60), ["k"], n_buckets=4)
    # build the inline twin with the REAL range (no sharding at 4)
    import unittest.mock as mock

    with mock.patch.object(mfm, "SIDECAR_RANGE", 64):
        mfm.manifest_upsert(
            spark, ti, _frame(spark, 0, 60), ["k"], n_buckets=4
        )

    def both(fn):
        fn(ts)
        with mock.patch.object(mfm, "SIDECAR_RANGE", 64):
            fn(ti)

    def same():
        a = {
            (r.k, r.v, r.tag)
            for r in mfm.read_manifest_table(spark, ts).collect()
        }
        b = {
            (r.k, r.v, r.tag)
            for r in mfm.read_manifest_table(spark, ti).collect()
        }
        assert a == b
        return a

    both(lambda t: mfm.manifest_upsert(spark, t, _one_key(spark, 3, 77), ["k"]))
    same()
    both(lambda t: mfm.delete_where(spark, t, "k % 9 = 0"))
    same()
    both(lambda t: mfm.update_where(
        spark, t, F.col("k") < 5, {"v": F.col("v") + 1000}
    ))
    same()
    both(lambda t: mfm.add_bloom_index(spark, t, "tag"))
    for t in (ts, ti):
        assert mfm.read_manifest_table(
            spark, t, skip=[("tag", "=", "t41")]
        ).count() == 1
        assert mfm.read_manifest_table(
            spark, t, skip=[("tag", "=", "zzz")]
        ).inputFiles() == []
    both(lambda t: mfm.optimize_table(spark, t, cluster_by=["v"]))
    same()
    vs = mfm.read_manifest(ts)["version"]
    both(lambda t: mfm.optimize_table(spark, t, n_buckets=6))
    same()
    both(lambda t: mfm.restore_table(spark, t, version=vs))
    fin = same()
    assert len(fin) > 0
    # clone step (r12): fork both tables, read-compare, then write to
    # each clone — the sharded side exercises carried-`base` assembly
    # and the resolved-content carry on the clone's first commit
    cs, ci = str(tmp_path / "shard_cl"), str(tmp_path / "inl_cl")
    mfm.clone_table(spark, ts, cs)
    with mock.patch.object(mfm, "SIDECAR_RANGE", 64):
        mfm.clone_table(spark, ti, ci)
    mfm.manifest_upsert(spark, cs, _one_key(spark, 5, 808), ["k"])
    with mock.patch.object(mfm, "SIDECAR_RANGE", 64):
        mfm.manifest_upsert(spark, ci, _one_key(spark, 5, 808), ["k"])
    ca = {
        (r.k, r.v, r.tag)
        for r in mfm.read_manifest_table(spark, cs).collect()
    }
    cb = {
        (r.k, r.v, r.tag)
        for r in mfm.read_manifest_table(spark, ci).collect()
    }
    assert ca == cb and (5, 808, "t5") in ca
    assert same() == fin  # sources untouched by clone writes


def test_point_lookup_parses_only_covering_sidecars(
    spark, tmp_path, small_range
):
    """r11 two-phase lookup: slim scalars plan the buckets, then only
    the COVERING ranges' sidecars resolve — a 1-key probe on an
    8-range table parses one sidecar, not eight."""
    t = str(tmp_path / "lkp")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    assert len(mfm._read_slim(t, 1)["sidecars"]) == 8
    mfm._load_sidecar.cache_clear()
    row = mfm.read_manifest_lookup(spark, t, {"k": 21}).head()
    assert row["v"] == 42
    info = mfm._load_sidecar.cache_info()
    assert info.misses == 1, info  # exactly the covering range
    # partial manifests carry only covering-range entries
    mf = mfm.read_manifest(t, buckets=[0])
    assert set(mf["buckets"]) <= {"0", "1"}
    # and the slim-only call carries none
    mf0 = mfm.read_manifest(t, buckets=[])
    assert mf0["buckets"] == {} and mf0["n_buckets"] == 16


def test_partial_read_uses_manifest_own_range_width(
    spark, tmp_path, monkeypatch
):
    """r11: the bucket->range mapping must use the WIDTH THE MANIFEST
    WAS WRITTEN WITH (`sidecar_range`), never the module constant — a
    build upgrade that changes SIDECAR_RANGE would otherwise compute
    wrong range starts for old manifests, silently skip their
    sidecars, and return empty lookups."""
    t = str(tmp_path / "wdt")
    monkeypatch.setattr(mfm, "SIDECAR_RANGE", 2)
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    assert mfm._read_slim(t, 1)["sidecar_range"] == 2
    # "upgrade": the reader now ships a different default width
    monkeypatch.setattr(mfm, "SIDECAR_RANGE", 64)
    row = mfm.read_manifest_lookup(spark, t, {"k": 21}).head()
    assert row is not None and row["v"] == 42


def test_cdc_stream_plans_from_changed_ranges_only(
    spark, tmp_path, small_range
):
    """r11: the CDC stream planner diffs the two SLIM manifests'
    sidecar indexes first — ranges with identical (path, hash) entries
    provably changed nothing and their sidecars never load. A 1-key
    commit on an 8-range table plans its trigger from one sidecar
    pair, and the emitted change feed is exactly that key."""
    from trail_condition_etl_spark.sources import manifest_source as msrc
    from trail_condition_etl_spark.sinks.manifest import _data_schema

    t = str(tmp_path / "cdcp")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    mfm.manifest_upsert(spark, t, _one_key(spark, 21, 777), ["k"])
    schema = msrc.cdc_schema(_data_schema(mfm.read_manifest(t)))
    rdr = msrc.ManifestCDCStreamReader(schema, {"path": t})
    mfm._load_sidecar.cache_clear()
    parts = rdr.partitions({"version": 1}, {"version": 2})
    # metadata IO: one changed range at each span end = 2 sidecar
    # parses (the v1 original + the v2 rewrite of that range)
    assert mfm._load_sidecar.cache_info().misses == 2
    import pyarrow as pa

    rows = [
        row
        for p in parts
        for b in rdr.read(p)
        for row in pa.Table.from_batches([b]).to_pylist()
    ]
    assert {(r["k"], r["v"], r["change_type"]) for r in rows} == {
        (21, 777, "update")
    }


def test_metadata_count_parses_zero_sidecars(spark, tmp_path, small_range):
    """r11: publish stamps the exact COUNT(*) into the slim manifest,
    so a sharded table's metadata count never loads a sidecar; MoR
    deletes subtract; an unstatted commit honestly degrades to None."""
    t = str(tmp_path / "cnt")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    mfm._load_sidecar.cache_clear()
    assert mfm.manifest_row_count(t) == 80
    assert mfm._load_sidecar.cache_info().misses == 0
    mfm.delete_where(spark, t, "k % 8 = 0")
    assert mfm.manifest_row_count(t) == 70
    # time travel still counts the old snapshot
    assert mfm.manifest_row_count(t, version=1) == 80
    mfm.manifest_upsert(
        spark, t, _one_key(spark, 200, 1), ["k"], collect_stats=False
    )
    assert mfm.manifest_row_count(t) is None  # honest must-scan


def test_restore_rewrites_zero_sidecars(spark, tmp_path, small_range):
    """r12 (VERDICT r11 directive 6): sidecar files are
    CONTENT-ADDRESSED (`sc-<lo>-<hash>.json`, no version in the name),
    so a restore — whose per-bucket content is byte-identical to the
    restored version's — writes zero new sidecar files however far
    back it reverts; the slim index simply points at the existing
    files again."""
    t = str(tmp_path / "rst")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    mfm.manifest_upsert(spark, t, _one_key(spark, 3, 999), ["k"])
    before = _meta_files(t)
    serialized: list[int] = []
    real = mfm._serialize_range
    mfm._serialize_range = lambda c: serialized.append(1) or real(c)
    try:
        mfm.restore_table(spark, t, version=1)
    finally:
        mfm._serialize_range = real
    assert _meta_files(t) == before  # not one new byte of metadata
    # r13: and not one range re-serialized — with the bloom config
    # unchanged the restore carries version 1's sidecar index, agg
    # scalars, and total_rows verbatim (O(1) publish CPU)
    assert serialized == []
    # the restored slim index references EXACTLY version 1's files
    assert mfm._read_slim(t, 3)["sidecars"] == mfm._read_slim(t, 1)["sidecars"]
    assert mfm._read_slim(t, 3)["agg"] == mfm._read_slim(t, 1)["agg"]
    got = {r.k: r.v for r in mfm.read_manifest_table(spark, t).collect()}
    assert got[3] == 6 and len(got) == 80
    # and vacuum keeps multi-version-shared files while both versions
    # are retained (the sweep unions ALL retained refs)
    mfm.vacuum(t, keep_last=2)
    for v in mfm.list_versions(t):
        assert mfm.read_manifest_table(spark, t, version=v).count() == 80


def test_batch_table_changes_parses_changed_ranges_only(
    spark, tmp_path, small_range
):
    """r12 (VERDICT r11 directive 2): batch `table_changes` resolves
    its span through the SAME slim-index diff as the CDC stream
    planner — a 1-key commit on an 8-range table parses exactly the
    one changed range's sidecar pair (metadata IO O(change)), on top
    of the r11 data-IO bucket pruning. Covers the preimage form too
    (same span resolution)."""
    t = str(tmp_path / "cdfp")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    mfm.manifest_upsert(spark, t, _one_key(spark, 21, 777), ["k"])
    mfm._load_sidecar.cache_clear()
    changes = mfm.table_changes(spark, t, 1, 2)
    # one changed range at each span end = 2 sidecar parses
    assert mfm._load_sidecar.cache_info().misses == 2
    rows = {(r.k, r.v, r.change_type) for r in changes.collect()}
    assert rows == {(21, 777, "update")}
    pre = mfm.table_changes(spark, t, 1, 2, include_preimages=True)
    assert {(r.k, r.v, r.change_type) for r in pre.collect()} == {
        (21, 42, "update_preimage"),
        (21, 777, "update_postimage"),
    }
    assert mfm._load_sidecar.cache_info().misses == 2  # still cached


def test_clone_carries_sidecars_writing_zero_files(
    spark, tmp_path, small_range
):
    """r12 (VERDICT r11 directive 4): a sharded source's clone carries
    the source's sidecar FILES by absolute reference — each slim entry
    keeps (path, hash) and gains `base` — so the zero-data-copy fork
    is zero-METADATA-copy too: no `_meta/` files written at all (the
    old path re-sharded every range, ~12.5k files at the sizing rule).
    Reads, metadata count, and point lookups resolve through the
    carried refs; the clone's first write re-shards ONLY the touched
    range, the rest keep carrying."""
    src = str(tmp_path / "src")
    mfm.manifest_upsert(spark, src, _frame(spark, 0, 80), ["k"], n_buckets=16)
    dst = str(tmp_path / "dst")
    mfm.clone_table(spark, src, dst)
    assert _meta_files(dst) == set()  # zero sidecars written
    slim = mfm._read_slim(dst, 1)
    assert len(slim["sidecars"]) == 8
    src_abs = os.path.abspath(src)
    for ent in slim["sidecars"].values():
        assert os.path.isabs(ent["path"]) and ent["base"] == src_abs
    assert "sharded-metadata" in slim["required_reader_features"]
    got = {r.k: r.v for r in mfm.read_manifest_table(spark, dst).collect()}
    assert len(got) == 80 and got[21] == 42
    assert mfm.manifest_row_count(dst) == 80  # slim total_rows carried
    assert mfm.read_manifest_lookup(spark, dst, {"k": 21}).head()["v"] == 42
    # first clone write: ONE clone-local sidecar, 7 ranges still carried
    mfm.manifest_upsert(spark, dst, _one_key(spark, 21, 777), ["k"])
    assert len(_meta_files(dst)) == 1
    s2 = mfm._read_slim(dst, 2)["sidecars"]
    assert sum(1 for e in s2.values() if e.get("base")) == 7
    # write isolation both ways
    assert {
        r.v for r in mfm.read_manifest_table(spark, dst).filter("k = 21").collect()
    } == {777}
    assert {
        r.v for r in mfm.read_manifest_table(spark, src).filter("k = 21").collect()
    } == {42}


def test_chained_clone_keeps_original_base(spark, tmp_path, small_range):
    """Clone of a clone: carried entries keep the ORIGINAL owner as
    `base` (the file's relative refs are relative to it), and both
    clones read the grandparent's data correctly."""
    a = str(tmp_path / "a")
    mfm.manifest_upsert(spark, a, _frame(spark, 0, 80), ["k"], n_buckets=16)
    b = str(tmp_path / "b")
    mfm.clone_table(spark, a, b)
    c = str(tmp_path / "c")
    mfm.clone_table(spark, b, c)
    assert _meta_files(c) == set()
    a_abs = os.path.abspath(a)
    for ent in mfm._read_slim(c, 1)["sidecars"].values():
        assert ent["base"] == a_abs
    assert mfm.read_manifest_table(spark, c).count() == 80


def test_source_vacuum_retains_clone_carried_sidecars(
    spark, tmp_path, small_range
):
    """The source's vacuum must NOT sweep sidecar files a registered
    clone still carries — unlike data segments (which survive by
    carrying into kept manifests), a rewritten range's OLD sidecar
    drops out of the source's kept refs immediately, so the clone pin
    is its only keeper. After release_clone (+ clone materialize) the
    files age out normally."""
    src = str(tmp_path / "src")
    mfm.manifest_upsert(spark, src, _frame(spark, 0, 80), ["k"], n_buckets=16)
    dst = str(tmp_path / "dst")
    mfm.clone_table(spark, src, dst)
    # source rewrites one range, then vacuums to latest-only: the old
    # range sidecar is unreferenced by the source but carried by dst
    mfm.manifest_upsert(spark, src, _one_key(spark, 21, 555), ["k"])
    mfm.vacuum(src, keep_last=1)
    assert mfm.read_manifest_table(spark, dst).count() == 80
    assert {
        r.v for r in mfm.read_manifest_table(spark, dst).filter("k = 21").collect()
    } == {42}  # the clone still reads ITS pinned snapshot
    # materialize + release: the carried refs disappear from dst's
    # retained manifests, and the source's next vacuum sweeps freely
    mfm.optimize_table(spark, dst)
    mfm.vacuum(dst, keep_last=1)
    mfm.release_clone(src, dst)
    mfm.vacuum(src, keep_last=1)
    kept = _meta_files(src)
    referenced = {
        os.path.basename(e["path"])
        for e in mfm._read_slim(src, mfm.list_versions(src)[-1])[
            "sidecars"
        ].values()
    }
    assert kept == referenced
    assert mfm.read_manifest_table(spark, dst).count() == 80


def test_sharded_table_empties_and_refills(spark, tmp_path, small_range):
    """Regression (r12, found by the two-writer hypothesis model under
    a fresh seed): tombstoning EVERY row of a sharded table leaves an
    empty sidecar index (`"sidecars": {}` — falsy), and `_assemble`
    used to skip restoring the per-bucket maps, so every later read or
    commit raised KeyError('buckets'). Empty is a value, not an
    absence: the table must read as zero rows and accept new commits."""
    t = str(tmp_path / "empty")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 8), ["k"], n_buckets=4)
    allk = _frame(spark, 0, 8).withColumn("_del", F.lit(True))
    mfm.manifest_upsert(spark, t, allk, ["k"], tombstone_col="_del")
    assert mfm.read_manifest_table(spark, t).count() == 0
    assert mfm.manifest_row_count(t) == 0
    mfm.manifest_upsert(spark, t, _one_key(spark, 5, 55), ["k"])
    got = {(r.k, r.v) for r in mfm.read_manifest_table(spark, t).collect()}
    assert got == {(5, 55)}


def test_metadata_surfaces_parse_zero_sidecars(spark, tmp_path, small_range):
    """r12: the metadata-only read surfaces — DESCRIBE HISTORY,
    TIMESTAMP AS OF resolution, the CDC cursor poll, and the stream
    source's latestOffset — need slim scalars only (operation,
    timestamps, op metrics, total_rows, version, keys), so on a
    sharded table they parse ZERO sidecars however many versions they
    walk. Before r12 each walked version paid a full assembly."""
    import datetime as dt

    from trail_condition_etl_spark.sinks.manifest import _data_schema
    from trail_condition_etl_spark.sources import manifest_source as msrc
    from trail_condition_etl_spark.streaming.cdc import (
        _write_change_cursor,
        consume_table_changes,
    )

    t = str(tmp_path / "meta0")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    mfm.manifest_upsert(spark, t, _one_key(spark, 1, 11), ["k"])
    mfm._load_sidecar.cache_clear()
    hist = {r.version: r for r in mfm.describe_history(spark, t).collect()}
    assert hist[2]["table_rows"] == 80 and hist[2]["operation"] == "upsert"
    assert mfm.version_as_of(t, dt.datetime.now(dt.timezone.utc)) == 2
    schema = msrc.cdc_schema(_data_schema(mfm.read_manifest(t, buckets=[])))
    rdr = msrc.ManifestCDCStreamReader(schema, {"path": t})
    assert rdr.latestOffset() == {"version": 2}
    cur = str(tmp_path / "cursor")
    _write_change_cursor(cur, 2)  # up-to-date consumer: pure poll
    assert consume_table_changes(spark, t, cur, lambda *a: 0) == (2, 2)
    assert mfm._load_sidecar.cache_info().misses == 0


def test_cdc_stream_over_clone_carried_metadata(spark, tmp_path, small_range):
    """r12 composition: the CDC stream planner over a CLONE whose v1
    carries the source's sidecars by reference — the slim-index diff
    skips carried-vs-carried ranges (identical entries), the partial
    read resolves the touched range through `base`, and the per-bucket
    diff compares a source-absolute old dir against a clone-local new
    dir. The emitted feed is exactly the clone's own write."""
    import pyarrow as pa

    from trail_condition_etl_spark.sinks.manifest import _data_schema
    from trail_condition_etl_spark.sources import manifest_source as msrc

    src = str(tmp_path / "src")
    mfm.manifest_upsert(spark, src, _frame(spark, 0, 80), ["k"], n_buckets=16)
    dst = str(tmp_path / "dst")
    mfm.clone_table(spark, src, dst)
    mfm.manifest_upsert(spark, dst, _one_key(spark, 21, 777), ["k"])
    schema = msrc.cdc_schema(_data_schema(mfm.read_manifest(dst, buckets=[])))
    rdr = msrc.ManifestCDCStreamReader(schema, {"path": dst})
    parts = rdr.partitions({"version": 1}, {"version": 2})
    rows = [
        row
        for p in parts
        for b in rdr.read(p)
        for row in pa.Table.from_batches([b]).to_pylist()
    ]
    assert {(r["k"], r["v"], r["change_type"]) for r in rows} == {
        (21, 777, "update")
    }
    # and the batch form agrees
    got = {
        (r.k, r.v, r.change_type)
        for r in mfm.table_changes(spark, dst, 1, 2).collect()
    }
    assert got == {(21, 777, "update")}


def test_scalar_ddl_commits_parse_and_write_zero_sidecars(
    spark, tmp_path, small_range
):
    """r12: metadata-only DDL (rename, constraint add/drop, generated-
    rule drop) publishes through `_scalar_commit` — the new slim
    carries the previous version's sidecar index VERBATIM, so the
    commit parses zero sidecars and writes zero `_meta/` files (the
    general publish path re-hashes every range to discover nothing
    changed). Feature stamping survives: rename adds column-mapping,
    content features carry."""
    t = str(tmp_path / "ddl0")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    mfm.add_table_constraint(spark, t, "v_even", "v % 2 = 0")
    before = _meta_files(t)
    mfm._load_sidecar.cache_clear()
    mfm.rename_column(spark, t, "tag", "label")
    mfm.drop_table_constraint(spark, t, "v_even")
    assert mfm._load_sidecar.cache_info().misses == 0
    assert _meta_files(t) == before
    slim = mfm._read_slim(t, mfm.list_versions(t)[-1])
    assert "column-mapping" in slim["required_reader_features"]
    assert "sharded-metadata" in slim["required_reader_features"]
    assert slim["sidecars"] == mfm._read_slim(t, 1)["sidecars"]
    got = mfm.read_manifest_table(spark, t).filter("k = 7").head()
    assert got["label"] == "t7" and got["v"] == 14
    assert mfm.manifest_row_count(t) == 80  # total_rows carried


def test_clone_pins_owner_of_carried_meta_files(
    spark, tmp_path, small_range
):
    """ADVICE r12 (medium): clone pins must cover the owners of carried
    SIDECAR files, not just data-segment owners. C1 clones sharded O,
    then re-shards every range C1-LOCAL (bloom add) while its bucket
    refs stay absolute into O; C2 clones C1 — C2 owns no C1 DATA, so
    the data-ref loop alone pins only O, and after C1 drops the bloom
    index its old local sidecars (the exact files C2 carries) drop out
    of C1's retained refs. C1's vacuum must retain them via C2's pin
    instead of breaking C2's reads."""
    o = str(tmp_path / "o")
    mfm.manifest_upsert(spark, o, _frame(spark, 0, 80), ["k"], n_buckets=16)
    c1 = str(tmp_path / "c1")
    mfm.clone_table(spark, o, c1)
    mfm.add_bloom_index(spark, c1, "tag")  # every range re-shards C1-local
    files_a = _meta_files(c1)
    assert files_a  # C1 owns the sidecars C2 will carry
    c2 = str(tmp_path / "c2")
    mfm.clone_table(spark, c1, c2)
    c1_abs = os.path.abspath(c1)
    for ent in mfm._read_slim(c2, 1)["sidecars"].values():
        assert ent["path"].startswith(c1_abs) and ent["base"] == c1_abs
    # the pin lands under C1 (carried-meta owner), not just O (data owner)
    assert mfm._clone_pin_name(c2) in set(
        os.listdir(os.path.join(c1, "_clones"))
    )
    assert mfm._clone_pin_name(c2) in set(
        os.listdir(os.path.join(o, "_clones"))
    )
    # C1 moves on: the bloom-era sidecars leave C1's own retained refs
    mfm.drop_bloom_index(spark, c1, "tag")
    mfm.vacuum(c1, keep_last=1)
    assert files_a <= _meta_files(c1)  # retained for C2, not swept
    got = {r.k: r.v for r in mfm.read_manifest_table(spark, c2).collect()}
    assert len(got) == 80 and got[21] == 42


def test_delta_commit_serializes_only_touched_ranges(
    spark, tmp_path, small_range, monkeypatch
):
    """r13 (VERDICT r12 directive 2): DATA-commit driver CPU is
    O(change), not just metadata IO. A 1-key upsert on an 8-range
    table parses ONE sidecar, re-serializes ONE range, and writes ONE
    new file — every other index entry carries verbatim — and the
    incrementally-maintained agg scalars (live/dels/rows/...) and
    total_rows match a from-scratch recompute over the assembled
    manifest exactly."""
    t = str(tmp_path / "delta")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    serialized: list[int] = []
    real = mfm._serialize_range
    monkeypatch.setattr(
        mfm, "_serialize_range", lambda c: serialized.append(1) or real(c)
    )
    mfm._load_sidecar.cache_clear()
    before = _meta_files(t)
    mfm.manifest_upsert(spark, t, _one_key(spark, 21, 777), ["k"])
    assert len(serialized) == 1
    assert mfm._load_sidecar.cache_info().misses == 1
    assert len(_meta_files(t) - before) == 1
    slim = mfm._read_slim(t, 2)
    mf2 = mfm.read_manifest(t, 2)
    assert slim["agg"] == mfm._bucket_agg(mf2)
    assert slim["total_rows"] == 80
    assert mf2["op_metrics"]["buckets_written"] == 1
    assert mf2["op_metrics"]["buckets_carried"] == 15
    got = {r.k: r.v for r in mfm.read_manifest_table(spark, t).collect()}
    assert len(got) == 80 and got[21] == 777


def test_delta_commit_agg_tracks_tombstones_and_mor(
    spark, tmp_path, small_range
):
    """Delta commits compose with the rest of the lifecycle: a MoR
    delete in an UNTOUCHED range survives (the carried entry keeps its
    delete refs and the merge-on-read feature gate stays up via the
    agg delete count); tombstoning a touched bucket EMPTY removes it
    from the index and the incremental scalars; and a later general
    commit's from-scratch recompute agrees with the running values."""
    t = str(tmp_path / "deltamix")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    mfm.delete_where(spark, t, "k = 3")  # MoR delete, general path
    v2 = mfm.read_manifest(t)
    assert "merge-on-read-deletes" in v2["required_reader_features"]
    # delta commit in a DIFFERENT bucket: deletes carry, gate stays
    mfm.manifest_upsert(spark, t, _one_key(spark, 21, 777), ["k"])
    slim3 = mfm._read_slim(t, 3)
    assert "merge-on-read-deletes" in slim3["required_reader_features"]
    assert slim3["total_rows"] == 79
    mf3 = mfm.read_manifest(t, 3)
    assert slim3["agg"] == mfm._bucket_agg(mf3)
    # tombstone EVERY row of bucket holding k=21: the bucket leaves
    # the index and the scalars, via the delta path's `removed` leg
    b21 = None
    for b, d in mf3["buckets"].items():
        rows = spark.read.parquet(
            os.path.join(t, d) if not os.path.isabs(d) else d
        )
        if rows.filter("k = 21").count():
            b21 = b
            ks = [r.k for r in rows.collect()]
            break
    dead = spark.createDataFrame(
        [(k, 0, "x", True) for k in ks], "k long, v long, tag string, _d boolean"
    )
    mfm.manifest_upsert(spark, t, dead, ["k"], tombstone_col="_d")
    slim4 = mfm._read_slim(t, 4)
    mf4 = mfm.read_manifest(t, 4)
    assert b21 not in mf4["buckets"]
    assert slim4["agg"] == mfm._bucket_agg(mf4)
    assert slim4["total_rows"] == 79 - len(ks)
    assert mfm.manifest_row_count(t) == 79 - len(ks)
    assert mfm.read_manifest_table(spark, t).count() == 79 - len(ks)


def test_vacuum_clone_scan_parses_unique_sidecars_only(
    spark, tmp_path, small_range, monkeypatch
):
    """r13 (VERDICT r12 "What's missing" #3): the source-vacuum clone
    guard walks each registered clone as slim indexes plus the SET of
    unique sidecar files (initial carry + ranges that ever diverged) —
    never a full assembly per retained clone version. Pinned as zero
    `_merge_sidecar` calls from the clone scan: the only assemblies in
    the whole vacuum are the source's own two kept-manifest reads (8
    ranges × 2), however many versions the clone accumulated."""
    src = str(tmp_path / "src")
    mfm.manifest_upsert(spark, src, _frame(spark, 0, 80), ["k"], n_buckets=16)
    dst = str(tmp_path / "dst")
    mfm.clone_table(spark, src, dst)
    for i in range(5):  # a clone history: 5 rewrites of one bucket
        mfm.manifest_upsert(spark, dst, _one_key(spark, 21, 100 + i), ["k"])
    merges: list[int] = []
    real = mfm._merge_sidecar
    monkeypatch.setattr(
        mfm, "_merge_sidecar", lambda *a: merges.append(1) or real(*a)
    )
    assert mfm.vacuum(src, keep_last=1) == 0  # nothing sweepable
    assert len(merges) == 16
    # the guard still saw the clone's refs: a sweep that WOULD break
    # it raises (advance src so its kept manifest drops the old seg)
    mfm.manifest_upsert(
        spark, src, _frame(spark, 0, 80).withColumn("v", F.col("v") + 1), ["k"]
    )
    with pytest.raises(mfm.VacuumRetentionError):
        mfm.vacuum(src, keep_last=1)
    assert mfm.read_manifest_table(spark, dst).count() == 80


def test_mor_delete_serializes_only_hit_ranges(
    spark, tmp_path, small_range, monkeypatch
):
    """r13: `delete_where`'s merge-on-read commit rides the delta path
    — a 1-key delete on an 8-range table re-serializes ONE range and
    writes ONE new sidecar; the incremental scalars net the deleted
    key out of total_rows and raise the merge-on-read feature gate."""
    t = str(tmp_path / "mordelta")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    serialized: list[int] = []
    real = mfm._serialize_range
    monkeypatch.setattr(
        mfm, "_serialize_range", lambda c: serialized.append(1) or real(c)
    )
    before = _meta_files(t)
    mfm.delete_where(spark, t, "k = 21")
    assert len(serialized) == 1
    assert len(_meta_files(t) - before) == 1
    slim = mfm._read_slim(t, 2)
    assert slim["total_rows"] == 79
    assert "merge-on-read-deletes" in slim["required_reader_features"]
    mf2 = mfm.read_manifest(t, 2)
    assert slim["agg"] == mfm._bucket_agg(mf2)
    assert mfm.read_manifest_table(spark, t).filter("k = 21").count() == 0
    assert mfm.read_manifest_table(spark, t).count() == 79


@pytest.mark.parametrize("depth", [1, 2])
def test_cdc_stream_over_chained_clone_carried_metadata(
    spark, tmp_path, small_range, depth
):
    """VERDICT r12 directive 6: the CDC stream planner over a clone at
    depth 1 AND 2 — a chained clone's carried entries keep the
    GRANDPARENT as `base`, and the slim-index diff + partial reads must
    resolve grandparent-relative refs mid-stream. Also races a vacuum
    of the intermediate source against the stream: the pin written at
    clone time must keep the intermediate from sweeping metadata the
    reader still resolves."""
    import pyarrow as pa

    from trail_condition_etl_spark.sinks.manifest import _data_schema
    from trail_condition_etl_spark.sources import manifest_source as msrc

    root = str(tmp_path / "t0")
    mfm.manifest_upsert(spark, root, _frame(spark, 0, 80), ["k"], n_buckets=16)
    parent = root
    for d in range(depth):
        nxt = str(tmp_path / f"t{d + 1}")
        mfm.clone_table(spark, parent, nxt)
        parent = nxt
    leaf = parent
    root_abs = os.path.abspath(root)
    for ent in mfm._read_slim(leaf, 1)["sidecars"].values():
        assert ent["base"] == root_abs  # original owner, any depth
    mfm.manifest_upsert(spark, leaf, _one_key(spark, 21, 777), ["k"])
    if depth == 2:
        # the INTERMEDIATE (t1) vacuums mid-span: it owns none of the
        # leaf's carried metadata (all root-owned), so the sweep is a
        # no-op for the stream — and the leaf's pin under the root
        # keeps the root honest separately
        mfm.vacuum(str(tmp_path / "t1"), keep_last=1)
    schema = msrc.cdc_schema(
        _data_schema(mfm.read_manifest(leaf, buckets=[]))
    )
    rdr = msrc.ManifestCDCStreamReader(schema, {"path": leaf})
    parts = rdr.partitions({"version": 1}, {"version": 2})
    rows = [
        row
        for p in parts
        for b in rdr.read(p)
        for row in pa.Table.from_batches([b]).to_pylist()
    ]
    assert {(r["k"], r["v"], r["change_type"]) for r in rows} == {
        (21, 777, "update")
    }
    got = {
        (r.k, r.v, r.change_type)
        for r in mfm.table_changes(spark, leaf, 1, 2).collect()
    }
    assert got == {(21, 777, "update")}


def test_merge_into_parses_only_touched_ranges(
    spark, tmp_path, small_range
):
    """r13: MERGE's snapshot read is slim scalars + the touched
    buckets' ranges — a 1-key merge on an 8-range table parses ONE
    sidecar for its batch construction (the delta publish re-parses
    from cache), never a full assembly."""
    t = str(tmp_path / "mergedelta")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    mfm._load_sidecar.cache_clear()
    src = _one_key(spark, 21, 0).select(
        "k", (F.col("v") + 555).alias("v"), "tag"
    )
    mfm.merge_into(
        spark,
        t,
        src,
        when_matched_update={"v": F.col("src.v")},
        insert_not_matched=True,
    )
    assert mfm._load_sidecar.cache_info().misses == 1
    got = {r.k: r.v for r in mfm.read_manifest_table(spark, t).collect()}
    assert len(got) == 80 and got[21] == 555


def test_compact_serializes_only_target_ranges(
    spark, tmp_path, small_range, monkeypatch
):
    """r13: bucket-wise compaction publishes as a delta — compacting
    ONE bucket on an 8-range table re-serializes one range; the other
    seven index entries carry verbatim and the incremental scalars
    match a recompute."""
    t = str(tmp_path / "compdelta")
    mfm.manifest_upsert(spark, t, _frame(spark, 0, 80), ["k"], n_buckets=16)
    # fragment one bucket with three single-key commits
    for i, v in ((21, 1), (21, 2), (21, 3)):
        mfm.manifest_upsert(spark, t, _one_key(spark, 21, v), ["k"])
    mf = mfm.read_manifest(t)
    b21 = next(
        b
        for b, d in mf["buckets"].items()
        if spark.read.parquet(os.path.join(t, d)).filter("k = 21").count()
    )
    serialized: list[int] = []
    real = mfm._serialize_range
    monkeypatch.setattr(
        mfm, "_serialize_range", lambda c: serialized.append(1) or real(c)
    )
    v = mfm.compact_buckets(spark, t, bucket_ids=[int(b21)])
    assert v is not None and len(serialized) == 1
    slim = mfm._read_slim(t, v)
    assert slim["agg"] == mfm._bucket_agg(mfm.read_manifest(t, v))
    got = {r.k: r.v for r in mfm.read_manifest_table(spark, t).collect()}
    assert len(got) == 80 and got[21] == 3
