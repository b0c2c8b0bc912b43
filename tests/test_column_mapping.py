"""Column mapping (Delta's RENAME/DROP COLUMN without rewrite):
metadata-only renames and drops, physical names stable on disk,
every read surface translating at the edge.

Contract: files ALWAYS hold physical names; logical names live only in
the manifest schema + mapping. A rename changes zero data bytes; a
drop hides the column (physically purged by the next optimize); a
re-add after drop gets a FRESH physical name so old bytes can never
resurrect.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trail_condition_etl_spark.sinks.manifest import (
    add_bloom_index,
    add_table_constraint,
    clone_table,
    delete_where,
    drop_column,
    manifest_upsert,
    merge_into,
    optimize_table,
    read_manifest,
    read_manifest_lookup,
    read_manifest_table,
    rename_column,
    restore_table,
    table_changes,
    update_where,
)
from trail_condition_etl_spark.sources.manifest_source import (
    register_manifest_sources,
)


def _frame(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"),
        (F.col("id") * 2).alias("chars"),
        (F.col("id") % 7).cast("int").alias("grade"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    manifest_upsert(spark, t, _frame(spark, 0, 100), ["doc_id"], n_buckets=4)
    return t


def _seg_files_schema_names(table) -> set:
    """Physical column names actually on disk (first data file found)."""
    import pyarrow.parquet as pq

    mf = read_manifest(table)
    d = os.path.join(table, next(iter(mf["buckets"].values())))
    f = next(fn for fn in sorted(os.listdir(d)) if fn.endswith(".parquet"))
    return set(pq.ParquetFile(os.path.join(d, f)).schema_arrow.names)


def test_rename_is_metadata_only(spark, table):
    before = _seg_files_schema_names(table)
    v = read_manifest(table)["version"]
    rename_column(spark, table, "chars", "n_chars")
    mf = read_manifest(table)
    assert mf["version"] == v + 1
    assert mf["column_mapping"] == {"n_chars": "chars"}
    assert _seg_files_schema_names(table) == before  # zero bytes moved
    df = read_manifest_table(spark, table)
    assert "n_chars" in df.columns and "chars" not in df.columns
    assert df.filter(F.col("doc_id") == 21).head()["n_chars"] == 42


def test_rename_then_write_reads_back_merged(spark, table):
    rename_column(spark, table, "chars", "n_chars")
    batch = _frame(spark, 90, 110).withColumnRenamed("chars", "n_chars")
    manifest_upsert(
        spark, table, batch.withColumn("n_chars", F.col("n_chars") + 1),
        ["doc_id"],
    )
    df = read_manifest_table(spark, table)
    assert df.count() == 110
    assert df.filter(F.col("doc_id") == 95).head()["n_chars"] == 191
    assert df.filter(F.col("doc_id") == 10).head()["n_chars"] == 20
    # new files still write the PHYSICAL name: the whole table stays
    # uniformly physical on disk
    mf = read_manifest(table)
    assert mf["column_mapping"] == {"n_chars": "chars"}


def test_rename_rejects_keys_constraints_collisions(spark, table):
    with pytest.raises(ValueError, match="merge key"):
        rename_column(spark, table, "doc_id", "id2")
    with pytest.raises(ValueError, match="no column"):
        rename_column(spark, table, "nope", "x")
    with pytest.raises(ValueError, match="already"):
        rename_column(spark, table, "chars", "src")
    add_table_constraint(spark, table, "grade_pos", "grade >= 0")
    with pytest.raises(ValueError, match="constraint"):
        rename_column(spark, table, "grade", "g2")


def test_drop_column_hides_and_optimize_purges(spark, table):
    drop_column(spark, table, "grade")
    df = read_manifest_table(spark, table)
    assert "grade" not in df.columns
    assert "grade" in _seg_files_schema_names(table)  # still on disk
    optimize_table(spark, table)
    assert "grade" not in _seg_files_schema_names(table)  # purged
    assert read_manifest_table(spark, table).count() == 100


def test_readd_after_drop_never_resurrects(spark, table):
    drop_column(spark, table, "grade")
    # re-add 'grade' via an evolving batch touching SOME buckets only
    batch = _frame(spark, 0, 10).withColumn("grade", F.lit(99))
    manifest_upsert(spark, table, batch, ["doc_id"])
    df = read_manifest_table(spark, table)
    got = {r.doc_id: r.grade for r in df.select("doc_id", "grade").collect()}
    assert all(got[i] == 99 for i in range(10))
    # rows in untouched buckets hold files where the RETIRED physical
    # 'grade' still exists — they must read NULL, not the old value
    assert all(v is None for k, v in got.items() if k >= 10)
    mf = read_manifest(table)
    assert mf["column_mapping"]["grade"] != "grade"  # fresh physical


def test_rename_roundtrip_back_to_original_name(spark, table):
    rename_column(spark, table, "chars", "n_chars")
    rename_column(spark, table, "n_chars", "chars")
    mf = read_manifest(table)
    assert mf.get("column_mapping", {}) in ({}, {"chars": "chars"})
    df = read_manifest_table(spark, table)
    assert df.filter(F.col("doc_id") == 21).head()["chars"] == 42


def test_dml_through_mapping(spark, table):
    rename_column(spark, table, "chars", "n_chars")
    update_where(
        spark, table, "doc_id = 5", {"n_chars": F.lit(1000).cast("long")}
    )
    assert read_manifest_table(spark, table).filter(
        F.col("doc_id") == 5
    ).head()["n_chars"] == 1000
    delete_where(spark, table, "doc_id = 6")
    assert read_manifest_table(spark, table).filter(
        F.col("doc_id") == 6
    ).count() == 0
    src = spark.createDataFrame([(7, 777)], "doc_id long, n_chars long")
    merge_into(
        spark, table, src, when_matched_update={"n_chars": F.col("src.n_chars")}
    )
    assert read_manifest_table(spark, table).filter(
        F.col("doc_id") == 7
    ).head()["n_chars"] == 777


def test_lookup_and_skip_scan_through_mapping(spark, table):
    rename_column(spark, table, "chars", "n_chars")
    row = read_manifest_lookup(spark, table, {"doc_id": 21}).head()
    assert row["n_chars"] == 42
    df = read_manifest_table(
        spark, table, skip=[("n_chars", "between", (40, 44))]
    )
    assert sorted(r.doc_id for r in df.collect()) == [20, 21, 22]


def test_bloom_through_mapping(spark, table):
    rename_column(spark, table, "src", "source_tag")
    add_bloom_index(spark, table, "source_tag")
    mf = read_manifest(table)
    assert set(mf["bloom"]) == {"src"}  # config keyed PHYSICAL
    df = read_manifest_table(
        spark, table, skip=[("source_tag", "=", "s1")]
    )
    assert df.count() == 33
    assert read_manifest_table(
        spark, table, skip=[("source_tag", "=", "zzz")]
    ).inputFiles() == []


def test_table_changes_across_rename_boundary(spark, table):
    v1 = read_manifest(table)["version"]
    rename_column(spark, table, "chars", "n_chars")
    manifest_upsert(
        spark, table,
        _frame(spark, 0, 1).withColumnRenamed("chars", "n_chars")
        .withColumn("n_chars", F.lit(123).cast("long")),
        ["doc_id"],
    )
    ch = table_changes(spark, table, v1).collect()
    # rename is metadata-only: ONLY the really-changed row appears,
    # under the NEW logical name
    assert len(ch) == 1 and ch[0].doc_id == 0 and ch[0].n_chars == 123
    assert ch[0].change_type == "update"


def test_table_changes_across_rename_then_optimize(spark, table):
    """r11 regression (advisor): optimize must PRESERVE assigned
    physical names. CDF/table_changes align old/new sides by physical
    identity, so a rewrite that re-keyed a renamed column back to its
    logical name would read the old side as NULL and emit EVERY row as
    a phantom update with NULL preimages across the optimize."""
    rename_column(spark, table, "chars", "n_chars")
    v1 = read_manifest(table)["version"]
    optimize_table(spark, table)
    manifest_upsert(
        spark, table,
        _frame(spark, 5, 6).withColumnRenamed("chars", "n_chars")
        .withColumn("n_chars", F.lit(777).cast("long")),
        ["doc_id"],
    )
    ch = table_changes(spark, table, v1).collect()
    assert len(ch) == 1 and ch[0].doc_id == 5 and ch[0].n_chars == 777
    assert ch[0].change_type == "update"
    # physical name survived the rewrite: files still say 'chars'
    assert "chars" in _seg_files_schema_names(table)
    assert read_manifest(table)["column_mapping"] == {"n_chars": "chars"}


def test_cdc_stream_span_crossing_optimize(spark, table, tmp_path):
    """r11 regression (advisor): the CDC stream reader anchors one
    mapping for every file in the span — sound only because physical
    names are immutable, including across an optimize mid-span. A
    re-keying rewrite would NULL-fill the renamed column for
    pre-optimize versions."""
    register_manifest_sources(spark)
    rename_column(spark, table, "chars", "n_chars")
    baseline = read_manifest(table)["version"]
    manifest_upsert(
        spark, table,
        _frame(spark, 300, 302).withColumnRenamed("chars", "n_chars"),
        ["doc_id"],
    )
    optimize_table(spark, table)
    manifest_upsert(
        spark, table,
        _frame(spark, 302, 304).withColumnRenamed("chars", "n_chars"),
        ["doc_id"],
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("manifest_cdc")
        .option("path", table)
        .option("startingVersion", str(baseline))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    ins = {
        r.doc_id: r.n_chars
        for r in got.filter(F.col("change_type") == "insert").collect()
    }
    # inserts from BOTH sides of the optimize carry real values
    assert ins[300] == 600 and ins[303] == 606
    # the optimize itself is a no-op to CDC: no phantom updates
    upd = got.filter(F.col("change_type").isin("update", "delete"))
    assert upd.count() == 0


def test_restore_and_clone_carry_mapping(spark, table, tmp_path):
    rename_column(spark, table, "chars", "n_chars")
    v_renamed = read_manifest(table)["version"]
    drop_column(spark, table, "grade")
    restore_table(spark, table, version=v_renamed)
    df = read_manifest_table(spark, table)
    assert "n_chars" in df.columns and "grade" in df.columns
    dst = str(tmp_path / "clone")
    clone_table(spark, table, dst)
    assert read_manifest_table(spark, dst).filter(
        F.col("doc_id") == 21
    ).head()["n_chars"] == 42


def test_datasource_batch_read_through_mapping(spark, table):
    rename_column(spark, table, "chars", "n_chars")
    drop_column(spark, table, "grade")
    register_manifest_sources(spark)
    d = spark.read.format("manifest").load(table)
    assert "n_chars" in d.columns and "grade" not in d.columns
    assert d.filter(F.col("doc_id") == 21).head()["n_chars"] == 42
    # pushed equality filter still stats-prunes through the mapping
    assert d.filter(F.col("n_chars") == 42).count() == 1


def test_cdc_stream_across_rename(spark, table, tmp_path):
    register_manifest_sources(spark)
    rename_column(spark, table, "chars", "n_chars")
    baseline = read_manifest(table)["version"]
    manifest_upsert(
        spark, table,
        _frame(spark, 200, 203).withColumnRenamed("chars", "n_chars"),
        ["doc_id"],
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("manifest_cdc")
        .option("path", table)
        .option("startingVersion", str(baseline))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert "n_chars" in got.columns
    ins = {r.doc_id for r in got.filter(F.col("change_type") == "insert").collect()}
    assert {200, 201, 202} <= ins

def test_cdf_batch_ending_before_rename_keeps_old_names(spark, table):
    """A batch CDF read whose span CLOSES before a later rename must
    translate files with the END version's mapping — its schema carries
    the old logical names (the r10 anchor fix: an inverse map built
    from the latest manifest would rename files to names the older
    schema lacks and null-fill the column)."""
    register_manifest_sources(spark)
    v_end = read_manifest(table)["version"]
    rename_column(spark, table, "chars", "n_chars")
    got = (
        spark.read.format("manifest")
        .option("path", table)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .option("endingVersion", str(v_end))
        .load()
    )
    assert "chars" in got.columns and "n_chars" not in got.columns
    rows = {r.doc_id: r.chars for r in got.collect()}
    assert rows[21] == 42 and len(rows) == 100

def test_reader_feature_gate(spark, table, tmp_path):
    """Delta's protocol contract: a manifest that REQUIRES a feature an
    older build lacks must refuse to load (misreading — e.g. NULLing a
    renamed column — is wrong data, not an error). Features are stamped
    from content: plain tables stay gate-free."""
    import json

    from trail_condition_etl_spark.sinks.manifest import (
        UnsupportedTableFeatureError,
        _manifest_path,
        required_reader_features,
    )

    mf = read_manifest(table)
    assert mf["required_reader_features"] == []  # plain table: no gate
    rename_column(spark, table, "chars", "n_chars")
    mf = read_manifest(table)
    assert mf["required_reader_features"] == ["column-mapping"]
    delete_where(spark, table, "doc_id = 3")
    assert set(read_manifest(table)["required_reader_features"]) == {
        "column-mapping", "merge-on-read-deletes",
    }
    # optimize materializes deletes (that gate drops) but PRESERVES
    # physical names (r11: CDF aligns by physical identity across a
    # rewrite), so column-mapping persists until the rename is undone
    optimize_table(spark, table)
    assert read_manifest(table)["required_reader_features"] == [
        "column-mapping"
    ]
    rename_column(spark, table, "n_chars", "chars")
    assert read_manifest(table)["required_reader_features"] == []
    # a future feature this build doesn't know: every read path refuses
    v = read_manifest(table)["version"]
    p = _manifest_path(table, v)
    doc = json.load(open(p))
    doc["required_reader_features"] = ["deletion-vectors-v9"]
    json.dump(doc, open(p, "w"))
    with pytest.raises(UnsupportedTableFeatureError, match="deletion-vectors-v9"):
        read_manifest_table(spark, table)
    with pytest.raises(UnsupportedTableFeatureError):
        read_manifest_lookup(spark, table, {"doc_id": 21})
    register_manifest_sources(spark)
    with pytest.raises(Exception, match="deletion-vectors-v9"):
        spark.read.format("manifest").load(table).collect()


def test_bloom_survives_rename_of_indexed_column(spark, table):
    """r11 directive: bloom config keys by PHYSICAL name precisely so
    a later logical rename keeps pruning — index FIRST, rename AFTER,
    probe under the NEW name."""
    add_bloom_index(spark, table, "src")
    rename_column(spark, table, "src", "source_tag")
    mf = read_manifest(table)
    assert set(mf["bloom"]) == {"src"}  # still the physical name
    # probe under the new logical name: prunes absents, finds presents
    assert read_manifest_table(
        spark, table, skip=[("source_tag", "=", "zzz")]
    ).inputFiles() == []
    df = read_manifest_table(
        spark, table, skip=[("source_tag", "=", "s1")]
    )
    assert df.count() == 33


def test_drop_column_removes_its_bloom(spark, table):
    """Dropping a bloomed column removes both its config and every
    bucket's bitmaps for it — dead index bytes must not ride the
    manifest forever (manifest.py drop_column's bloom sweep)."""
    add_bloom_index(spark, table, "src")
    mf = read_manifest(table)
    assert "src" in mf["bloom"]
    drop_column(spark, table, "src")
    mf = read_manifest(table)
    assert mf["bloom"] == {}
    assert not any(
        "src" in cols for cols in mf.get("blooms", {}).values()
    )
