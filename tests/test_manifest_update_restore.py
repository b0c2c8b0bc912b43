"""UPDATE ... WHERE and RESTORE TABLE (sinks/manifest.py `update_where`
/ `restore_table`): Delta's UPDATE (copy-on-write of exactly the
touched buckets) and RESTORE (metadata-only rollback that preserves
history and refuses to point at vacuumed data)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trail_condition_etl_spark.sinks import manifest as mf


def _table(spark, tmp_path, n=100, n_buckets=4):
    rows = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 10).cast("long").alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 3)).alias("tag"),
    )
    table = str(tmp_path / "t")
    mf.manifest_upsert(spark, table, rows, ["k"], n_buckets=n_buckets)
    return table


def _rows(spark, table, version=None):
    return {
        r.k: (r.v, r.tag)
        for r in mf.read_manifest_table(spark, table, version).collect()
    }


def test_update_where_rewrites_matched_rows_only(spark, tmp_path):
    table = _table(spark, tmp_path)
    v = mf.update_where(
        spark, table, "k < 3", {"v": F.col("v") + F.lit(1), "tag": "'hot'"}
    )
    assert v == 2
    got = _rows(spark, table)
    assert got[0] == (1, "hot") and got[2] == (21, "hot")
    assert got[3] == (30, "s0")  # untouched
    assert len(got) == 100
    assert mf.read_manifest(table)["operation"] == "update"
    # time travel: pre-update snapshot intact
    assert _rows(spark, table, version=1)[0] == (0, "s0")


def test_update_touches_only_matched_buckets(spark, tmp_path):
    """Copy-on-write IO proportionality: an update matching one key
    rewrites one bucket; every other bucket dir carries by reference."""
    table = _table(spark, tmp_path)
    before = mf.read_manifest(table)["buckets"]
    mf.update_where(spark, table, "k = 5", {"v": F.lit(0).cast("long")})
    after = mf.read_manifest(table)["buckets"]
    changed = [b for b in after if after[b] != before[b]]
    assert len(changed) == 1
    met = mf.read_manifest(table)["op_metrics"]
    assert met["buckets_written"] == 1


def test_update_rejects_key_and_unknown_columns(spark, tmp_path):
    table = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="merge key"):
        mf.update_where(spark, table, "k = 1", {"k": F.lit(9)})
    with pytest.raises(ValueError, match="not in table schema"):
        mf.update_where(spark, table, "k = 1", {"nope": F.lit(9)})


def test_update_no_match_commits_nothing(spark, tmp_path):
    table = _table(spark, tmp_path)
    v = mf.update_where(spark, table, "k > 10000", {"v": F.lit(0)})
    assert v == 1
    assert mf.read_manifest(table)["version"] == 1


def test_update_respects_check_constraints(spark, tmp_path):
    """The updated rows ride manifest_upsert's commit gate: an UPDATE
    producing constraint-violating rows aborts atomically."""
    table = _table(spark, tmp_path)
    mf.add_table_constraint(spark, table, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="v_nonneg"):
        mf.update_where(
            spark, table, "k < 5", {"v": F.lit(-1).cast("long")}
        )
    assert _rows(spark, table)[0] == (0, "s0")  # nothing landed


def test_update_skips_pending_mor_deleted_rows(spark, tmp_path):
    """An UPDATE must not resurrect a merge-on-read-deleted row even
    when the predicate would have matched it."""
    table = _table(spark, tmp_path)
    mf.delete_where(spark, table, "k = 1")
    mf.update_where(spark, table, "k < 3", {"tag": "'hot'"})
    got = _rows(spark, table)
    assert 1 not in got
    assert got[0][1] == "hot" and got[2][1] == "hot"


def test_update_with_skip_hint_matches_unpruned_update(spark, tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    a = _table(spark, tmp_path / "a")
    b = _table(spark, tmp_path / "b")
    mf.update_where(spark, a, "v < 100", {"tag": "'hot'"})
    mf.update_where(
        spark, b, "v < 100", {"tag": "'hot'"}, skip=[("v", "<", 100)]
    )
    assert _rows(spark, a) == _rows(spark, b)
    assert _rows(spark, b)[5][1] == "hot"


def test_require_version_precondition_guards_stale_commits(spark, tmp_path):
    """The OCC primitive: a commit preconditioned on a snapshot version
    aborts (table untouched) when another writer landed first."""
    table = _table(spark, tmp_path)
    batch = spark.createDataFrame([(0, 1, "x")], "k int, v long, tag string")
    with pytest.raises(mf.ConcurrentWriteError):
        mf.manifest_upsert(spark, table, batch, ["k"], require_version=7)
    assert mf.read_manifest(table)["version"] == 1
    assert _rows(spark, table)[0] == (0, "s0")
    # the matching version commits
    v = mf.manifest_upsert(spark, table, batch, ["k"], require_version=1)
    assert v == 2


def test_update_recomputes_when_a_writer_lands_mid_flight(spark, tmp_path):
    """Write-skew guard: a delete that lands between the UPDATE's
    snapshot read and its commit must NOT be overwritten — the update
    recomputes against the new snapshot, so the deleted row stays
    deleted and the survivors still get updated."""
    table = _table(spark, tmp_path)
    real_upsert = mf.manifest_upsert
    fired = {"n": 0}

    def sneaky(*args, **kwargs):
        if kwargs.get("operation") == "update" and fired["n"] == 0:
            fired["n"] += 1
            mf.delete_where(spark, table, "k = 1")  # lands first
        return real_upsert(*args, **kwargs)

    import unittest.mock as mock

    with mock.patch.object(mf, "manifest_upsert", side_effect=sneaky):
        mf.update_where(spark, table, "k < 3", {"tag": "'hot'"})
    assert fired["n"] == 1
    got = _rows(spark, table)
    assert 1 not in got  # the concurrent delete was not overwritten
    assert got[0][1] == "hot" and got[2][1] == "hot"
    # versions: base, delete, then exactly ONE update commit
    hist = [
        r.operation
        for r in mf.describe_history(spark, table)
        .orderBy("version")
        .collect()
    ]
    assert hist == ["upsert", "delete", "update"]


def test_merge_into_retries_on_conflict(spark, tmp_path):
    table = _table(spark, tmp_path)
    real_upsert = mf.manifest_upsert
    fired = {"n": 0}

    def sneaky(*args, **kwargs):
        if kwargs.get("operation") == "merge" and fired["n"] == 0:
            fired["n"] += 1
            mf.delete_where(spark, table, "k = 2")
        return real_upsert(*args, **kwargs)

    import unittest.mock as mock

    src = spark.createDataFrame([(2, 5, "m")], "k int, v long, tag string")
    with mock.patch.object(mf, "manifest_upsert", side_effect=sneaky):
        mf.merge_into(
            spark,
            table,
            src,
            when_matched_update={"v": F.col("src.v")},
        )
    got = _rows(spark, table)
    # the delete landed first, so k=2 was NOT MATCHED on recompute and
    # inserted fresh from the source (not updated in place)
    assert got[2] == (5, "m")
    assert fired["n"] == 1


def test_restore_is_metadata_only_and_preserves_history(spark, tmp_path):
    table = _table(spark, tmp_path)
    mf.update_where(spark, table, "k < 50", {"v": F.lit(0).cast("long")})
    seg_dirs_v1 = mf.read_manifest(table, 1)["buckets"]
    v = mf.restore_table(spark, table, version=1)
    assert v == 3
    after = mf.read_manifest(table)
    assert after["operation"] == "restore"
    assert after["buckets"] == seg_dirs_v1  # re-pointed, zero bytes moved
    assert after["op_metrics"] == {
        "restored_version": 1,
        "buckets_written": 0,
        "buckets_carried": len(seg_dirs_v1),
    }
    assert _rows(spark, table) == _rows(spark, table, version=1)
    # the undone version stays readable: the restore is itself undoable
    assert _rows(spark, table, version=2)[0][0] == 0
    assert mf.manifest_row_count(table) == 100


def test_restore_carries_pending_mor_deletes(spark, tmp_path):
    """Restoring to a version with pending delete files restores the
    DELETES too — the snapshot, not just the segments."""
    table = _table(spark, tmp_path)
    mf.delete_where(spark, table, "k % 10 = 0")  # v2: 90 rows
    mf.optimize_table(spark, table)  # v3: materialized
    v = mf.restore_table(spark, table, version=2)
    assert mf.read_manifest(table, v).get("deletes")
    assert mf.manifest_row_count(table) == 90
    assert len(_rows(spark, table)) == 90


def test_restore_refuses_vacuumed_snapshots(spark, tmp_path):
    table = _table(spark, tmp_path)
    mf.optimize_table(spark, table)  # v2 rewrites every segment
    mf.vacuum(table, keep_last=1)  # v1's segments swept
    with pytest.raises(ValueError, match="vacuumed"):
        mf.restore_table(spark, table, version=1)
    assert mf.read_manifest(table)["version"] == 2  # nothing committed


def test_restore_keeps_current_constraints(spark, tmp_path):
    table = _table(spark, tmp_path)
    mf.update_where(spark, table, "k = 1", {"tag": "'x'"})
    mf.add_table_constraint(spark, table, "v_nonneg", "v >= 0")
    mf.restore_table(spark, table, version=1)
    assert "v_nonneg" in mf.read_manifest(table)["constraints"]
    # and the constraint still gates post-restore commits
    with pytest.raises(ValueError, match="v_nonneg"):
        mf.update_where(spark, table, "k = 1", {"v": F.lit(-5).cast("long")})


def test_update_rejects_empty_set(spark, tmp_path):
    table = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="at least one SET"):
        mf.update_where(spark, table, "k < 5", {})
    assert mf.read_manifest(table)["version"] == 1


def test_restore_refuses_constraints_the_old_schema_cannot_resolve(
    spark, tmp_path
):
    """A current constraint referencing a column added AFTER the restore
    target would wedge every later narrow-batch commit on an
    unresolved-column error — the restore must refuse loudly instead."""
    table = _table(spark, tmp_path)
    widen = spark.createDataFrame(
        [(0, 0, "s0", 5)], "k int, v long, tag string, x long"
    )
    mf.manifest_upsert(spark, table, widen, ["k"])  # v2 adds column x
    mf.add_table_constraint(spark, table, "x_ok", "x IS NULL OR x >= 0")
    with pytest.raises(ValueError, match="x_ok"):
        mf.restore_table(spark, table, version=1)
    assert mf.read_manifest(table)["operation"] == "add-constraint"
    # dropping the constraint unblocks the rollback
    mf.drop_table_constraint(spark, table, "x_ok")
    v = mf.restore_table(spark, table, version=1)
    assert mf.read_manifest(table, v)["op_metrics"]["restored_version"] == 1


def test_restore_by_timestamp(spark, tmp_path):
    table = _table(spark, tmp_path)
    stamp = mf.read_manifest(table)["committed_at"]
    import datetime as dt

    mf.update_where(spark, table, "k < 50", {"v": F.lit(0).cast("long")})
    v = mf.restore_table(
        spark, table, as_of=dt.datetime.fromisoformat(stamp)
    )
    assert mf.read_manifest(table, v)["op_metrics"]["restored_version"] == 1
    assert _rows(spark, table)[10] == (100, "s1")
