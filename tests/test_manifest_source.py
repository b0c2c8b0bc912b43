"""Python DataSource API integration (sources/manifest_source.py):
batch format("manifest") with pushed-filter pruning, and the
format("manifest_cdc") streaming source (version offsets, checkpoint
resume, per-bucket change partitions)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In, LessThan

from trail_condition_etl_spark.sinks import manifest as mf
from trail_condition_etl_spark.sources import manifest_source as ms


def _table(spark, tmp_path, n=400, n_buckets=4):
    rows = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        ((F.col("id") * 7919) % n).cast("double").alias("price"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    table = str(tmp_path / "t")
    mf.manifest_upsert(spark, table, rows, ["k"], n_buckets=n_buckets)
    return table


def test_batch_source_reads_the_snapshot(spark, tmp_path):
    table = _table(spark, tmp_path)
    ms.register_manifest_sources(spark)
    got = spark.read.format("manifest").option("path", table).load()
    want = mf.read_manifest_table(spark, table)
    assert sorted(got.columns) == sorted(want.columns)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_batch_source_time_travel_version_option(spark, tmp_path):
    table = _table(spark, tmp_path)
    mf.manifest_upsert(
        spark,
        table,
        spark.createDataFrame([(0, 9.5, "vX")], "k int, price double, v string"),
        ["k"],
    )
    ms.register_manifest_sources(spark)
    v1 = (
        spark.read.format("manifest")
        .option("path", table)
        .option("version", 1)
        .load()
    )
    assert v1.filter(F.col("k") == 0).collect()[0].v == "v0"
    latest = spark.read.format("manifest").option("path", table).load()
    assert latest.filter(F.col("k") == 0).collect()[0].v == "vX"


def test_pushed_filters_prune_planned_partitions(spark, tmp_path):
    """pushFilters -> stats pruning: after a clustered optimize, a
    price predicate plans strictly fewer file partitions; results stay
    exact because every filter is returned to Spark as residual."""
    table = _table(spark, tmp_path)
    mf.optimize_table(
        spark, table, cluster_by=["price"], files_per_bucket=4
    )
    schema = mf._data_schema(mf.read_manifest(table))
    r = ms.ManifestBatchReader(schema, {"path": table})
    n_all = len(r.partitions())
    residual = r.pushFilters([LessThan(("price",), 50.0)])
    assert list(residual)  # partial pushdown: Spark re-evaluates
    assert 0 < len(r.partitions()) < n_all

    r2 = ms.ManifestBatchReader(schema, {"path": table})
    r2.pushFilters([In(("price",), (1.0, 2.0)), EqualTo(("v",), "v1")])
    assert len(r2.partitions()) < n_all

    # unsupported shapes contribute nothing but change nothing
    r3 = ms.ManifestBatchReader(schema, {"path": table})
    r3.pushFilters([GreaterThan(("nonexistent",), 1)])
    assert len(r3.partitions()) == n_all

    ms.register_manifest_sources(spark)
    got = (
        spark.read.format("manifest").option("path", table).load()
        .filter(F.col("price") < 50.0)
    )
    want = mf.read_manifest_table(spark, table).filter(
        F.col("price") < 50.0
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_cdc_stream_matches_table_changes(spark, tmp_path):
    """One AvailableNow pass from startingVersion=1 lands exactly the
    rows `table_changes(1, latest)` computes (collapsed span, new-side
    values on insert/update, null values on delete)."""
    table = _table(spark, tmp_path, n=100, n_buckets=2)
    mf.manifest_upsert(
        spark,
        table,
        spark.createDataFrame(
            [(0, 1.5, "vX"), (999, 2.5, "new")],
            "k int, price double, v string",
        ),
        ["k"],
    )
    dels = spark.createDataFrame([(7,)], "k int").withColumn(
        "_g", F.lit(True)
    )
    mf.manifest_upsert(spark, table, dels, ["k"], tombstone_col="_g")

    ms.register_manifest_sources(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("manifest_cdc")
        .option("path", table)
        .option("startingVersion", 1)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.k, r.price, r.v, r.change_type)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.k, r.price, r.v, r.change_type)
        for r in mf.table_changes(spark, table, 1).collect()
    }
    assert got == want
    assert {c for *_, c in got} == {"insert", "update", "delete"}


def test_cdc_stream_checkpoint_resume_emits_only_new_span(spark, tmp_path):
    """Restarting against the same checkpoint after a new commit emits
    ONLY the new span — the offset (a table version) survived in
    Spark's checkpoint, the genuine streaming-source contract."""
    table = _table(spark, tmp_path, n=60, n_buckets=2)
    ms.register_manifest_sources(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.format("manifest_cdc")
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()  # bootstrap: v0 -> v1, everything an insert
    first = spark.read.parquet(out).collect()
    assert len(first) == 60
    assert {r.change_type for r in first} == {"insert"}

    mf.manifest_upsert(
        spark,
        table,
        spark.createDataFrame([(3, 0.5, "vB")], "k int, price double, v string"),
        ["k"],
    )
    run_once()  # resume: only v1 -> v2
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 61
    new = [r for r in rows if r.change_type != "insert"]
    assert [(r.k, r.price, r.v, r.change_type) for r in new] == [
        (3, 0.5, "vB", "update")
    ]

    run_once()  # nothing new: no-op batch
    assert spark.read.parquet(out).count() == 61


def test_cdc_partitions_skip_carried_buckets(spark, tmp_path):
    """The stream reader plans change partitions ONLY for buckets whose
    segment dir changed — carried (immutable, by-reference) buckets
    cost nothing regardless of table size."""
    table = _table(spark, tmp_path, n=200, n_buckets=8)
    one = spark.createDataFrame(
        [(5, 1.0, "vN")], "k int, price double, v string"
    )
    mf.manifest_upsert(spark, table, one, ["k"])
    manifest = mf.read_manifest(table)
    schema = ms.cdc_schema(mf._data_schema(manifest))
    r = ms.ManifestCDCStreamReader(schema, {"path": table})
    parts = r.partitions({"version": 1}, {"version": 2})
    assert len(parts) == 1  # exactly the touched bucket
    import pyarrow as pa

    batches = list(r.read(parts[0]))
    tbl = pa.Table.from_batches(batches)
    rows = {
        tuple(d.values()) for d in tbl.to_pylist()
    }
    assert (5, 1.0, "vN", "update") in rows
