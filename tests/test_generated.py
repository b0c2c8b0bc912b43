"""Generated columns (Delta's GENERATED ALWAYS AS at the write edge):
compute when absent, validate when present, recompute on UPDATE, and
the dependency guards against rename/drop/restore."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trail_condition_etl_spark.sinks.manifest import (
    add_generated_column,
    drop_column,
    drop_generated_column,
    manifest_upsert,
    read_manifest,
    read_manifest_table,
    rename_column,
    restore_table,
    update_where,
)

EXPR = "chars DIV 10"


def _frame(spark, lo: int, hi: int, with_gen: bool = True):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("chars")
    )
    return df.withColumn("deca", F.expr(EXPR)) if with_gen else df


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "t")
    manifest_upsert(spark, t, _frame(spark, 0, 40), ["k"], n_buckets=4)
    add_generated_column(spark, t, "deca", EXPR)
    return t


def test_absent_column_is_computed(spark, table):
    manifest_upsert(spark, table, _frame(spark, 40, 50, with_gen=False), ["k"])
    rows = {r.k: r.deca for r in read_manifest_table(spark, table).collect()}
    assert rows[45] == 45 * 7 // 10 and len(rows) == 50


def test_present_column_is_validated(spark, table):
    bad = _frame(spark, 50, 55).withColumn("deca", F.lit(0).cast("long"))
    with pytest.raises(ValueError, match="generated column 'deca'"):
        manifest_upsert(spark, table, bad, ["k"])
    # table untouched
    assert read_manifest_table(spark, table).count() == 40
    # matching values pass
    manifest_upsert(spark, table, _frame(spark, 50, 55), ["k"])
    assert read_manifest_table(spark, table).count() == 45


def test_add_validates_existing_data(spark, tmp_path):
    t = str(tmp_path / "t2")
    df = _frame(spark, 0, 10).withColumn("deca", F.lit(-1).cast("long"))
    manifest_upsert(spark, t, df, ["k"], n_buckets=2)
    with pytest.raises(ValueError, match="existing row violates"):
        add_generated_column(spark, t, "deca", EXPR)
    with pytest.raises(ValueError, match="no column"):
        add_generated_column(spark, t, "nope", EXPR)
    with pytest.raises(ValueError, match="merge key"):
        add_generated_column(spark, t, "k", "k")


def test_update_recomputes(spark, table):
    update_where(
        spark, table, "k = 7", {"chars": F.lit(1000).cast("long")}
    )
    row = read_manifest_table(spark, table).filter(F.col("k") == 7).head()
    assert row.chars == 1000 and row.deca == 100


def test_rename_and_drop_refuse_dependencies(spark, table):
    with pytest.raises(ValueError, match="generated column"):
        rename_column(spark, table, "chars", "c2")
    with pytest.raises(ValueError, match="generated column"):
        drop_column(spark, table, "chars")
    with pytest.raises(ValueError, match="generated column"):
        rename_column(spark, table, "deca", "d2")
    drop_generated_column(spark, table, "deca")
    rename_column(spark, table, "deca", "d2")  # plain column now
    assert "d2" in read_manifest_table(spark, table).columns


def test_restore_probe_refuses_unresolvable_rule(spark, tmp_path):
    t = str(tmp_path / "t3")
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("b")
    )
    manifest_upsert(spark, t, base, ["k"], n_buckets=2)
    v1 = read_manifest(t)["version"]
    widened = base.withColumn("a", F.col("k") * 2).withColumn(
        "g", F.col("k") * 2 + 1
    )
    manifest_upsert(spark, t, widened, ["k"])
    add_generated_column(spark, t, "g", "a + 1")
    # v1's schema lacks `a`, the rule's INPUT: carrying the rule back
    # would wedge every later commit on an unresolved column
    with pytest.raises(ValueError, match="generated column 'g'"):
        restore_table(spark, t, version=v1)
    drop_generated_column(spark, t, "g")
    restore_table(spark, t, version=v1)  # fine without the rule
    assert "a" not in read_manifest_table(spark, t).columns


def test_dataframe_writer_append_computes(spark, table):
    from trail_condition_etl_spark.sources.manifest_source import (
        register_manifest_sources,
    )

    register_manifest_sources(spark)
    (
        _frame(spark, 60, 63, with_gen=False)
        .write.format("manifest")
        .mode("append")
        .option("path", table)
        .save()
    )
    rows = {r.k: r.deca for r in read_manifest_table(spark, table).collect()}
    assert rows[61] == 61 * 7 // 10


def test_merge_update_of_dependency_recomputes(spark, table):
    """r11 regression (advisor): a merge whose UPDATE clause changes a
    generated column's input used to carry the TARGET's stale generated
    value into the batch, and the write-edge row-for-row validation
    rejected the whole commit. The merge now recomputes the rule over
    its batch, mirroring update_where."""
    from trail_condition_etl_spark.sinks.manifest import merge_into

    src = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 1000).alias("chars")
    )
    merge_into(spark, table, src, when_matched_update={
        "chars": F.col("src.chars")
    })
    rows = {r.k: (r.chars, r.deca) for r in
            read_manifest_table(spark, table).collect()}
    assert rows[3] == (3000, 300)
    assert rows[20] == (140, 14)  # untouched row keeps its values


def test_merge_insert_from_narrow_source_recomputes(spark, table):
    """r11 regression: insert rows from a source lacking the generated
    column are NULL-filled by the union with the update branch — the
    rule must be recomputed for them, not validated against NULL."""
    from trail_condition_etl_spark.sinks.manifest import merge_into

    src = spark.range(38, 45).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("chars")
    )
    merge_into(spark, table, src, when_matched_update={
        "chars": F.col("src.chars")
    }, insert_not_matched=True)
    rows = {r.k: r.deca for r in read_manifest_table(spark, table).collect()}
    assert len(rows) == 45 and rows[42] == 42 * 7 // 10


def test_merge_refuses_explicit_set_of_generated(spark, table):
    """Delta's stance: a generated column cannot be SET in a merge
    clause — it is always engine-computed."""
    from trail_condition_etl_spark.sinks.manifest import merge_into

    src = spark.range(0, 3).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("chars")
    )
    with pytest.raises(ValueError, match="cannot SET generated column"):
        merge_into(spark, table, src, when_matched_update={
            "deca": F.lit(0)
        })


def test_merge_delete_with_nullsafe_expr_commits(spark, tmp_path):
    """Tombstone (delete) rows are key-only and NULL-filled; an
    expression non-null on NULL inputs (coalesce) must not wedge a
    merge containing deletes — tombstones are excluded from the
    write-edge validation."""
    from trail_condition_etl_spark.sinks.manifest import merge_into

    t = str(tmp_path / "t3")
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("chars")
    ).withColumn("g", F.coalesce(F.col("chars"), F.lit(0)))
    manifest_upsert(spark, t, df, ["k"], n_buckets=4)
    add_generated_column(spark, t, "g", "coalesce(chars, 0)")
    src = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("chars")
    )
    merge_into(spark, t, src, when_matched_delete=F.lit(True),
               insert_not_matched=False)
    assert read_manifest_table(spark, t).count() == 15


def test_merge_insert_with_divergent_explicit_value_rejects(spark, table):
    """r12 (ADVICE r11): an insert row whose SOURCE explicitly supplies
    a generated column must match the rule row-for-row — the write
    edge's contract; MERGE used to silently recompute over it. A
    matching explicit value still commits."""
    from trail_condition_etl_spark.sinks.manifest import merge_into

    bad = spark.createDataFrame(
        [(100, 70, 999)], "k long, chars long, deca long"
    )
    with pytest.raises(ValueError, match="violated by a merge insert"):
        merge_into(spark, table, bad, insert_not_matched=True)
    ok = spark.createDataFrame(
        [(100, 70, 7)], "k long, chars long, deca long"
    )
    merge_into(spark, table, ok, insert_not_matched=True)
    rows = {r.k: r.deca for r in read_manifest_table(spark, table).collect()}
    assert rows[100] == 7 and len(rows) == 41
