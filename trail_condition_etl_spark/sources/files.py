"""Schema-enforced JSONL / CSV file sources with corrupt-record routing.

The reference ingests JSON over HTTP and treats malformed payloads as DLQ
events (P7/S14 — fetch-weather/src/api.py:41-141 Pydantic validation,
categorize-trail-conditions DLQ policy). The file-source form of that
contract:

* schemas are EXPLICIT (`StructType`, never inferSchema — a schema scan
  of 100 TB of text before the real read is absurd, and inference drift
  silently changes types between runs);
* mode=PERMISSIVE with `columnNameOfCorruptRecord`: a malformed line
  becomes a row whose data columns are null and whose corrupt column
  holds the raw text — split into (good, rejects) so bad producers land
  in the DLQ with their original bytes instead of failing the job
  (FAILFAST) or vanishing (DROPMALFORMED);
* JSONL (one object per line) rather than multiline JSON: line-splittable
  inputs parallelize by byte range; a multiline JSON document forces
  whole-file tasks.

Spark quirk handled here: referencing ONLY the corrupt-record column of
a just-read JSON/CSV frame is disallowed (SPARK-21610) — the reader
caches the parsed frame before the split, which is also what you want
operationally (one parse feeding both branches).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators import artifacts
from .. import catalog

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON with the declared schema. Returns
    (good, rejects): rejects carry the raw malformed line in
    `_corrupt_record`."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()  # SPARK-21610: corrupt-col-only queries need this
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, rejects


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of `read_jsonl` — same (good, rejects) contract; a row
    whose cells fail to cast to the declared types is a reject."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
        .cache()
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, rejects


# ---------------------------------------------------------------------------
# oracle-checked registered-query form
# ---------------------------------------------------------------------------

# built with explicit types: StructType.fromDDL needs a live SparkSession,
# which must not be an import-time requirement of this module
EVENTS_JSONL_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def jsonl_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the events table as JSONL text (timestamps as exact integer
    microseconds — no string-format round-trip ambiguity), read it back
    through the schema-enforced source, and aggregate. The oracle runs
    the same aggregation on the parquet directly, so a parse/typing drift
    in the JSON path (quoting, number width, null shape) breaks parity."""
    events = catalog.load_table(spark, sf_dir, "events")
    root = artifacts.scratch_dir("jsonl_src_")
    staging = os.path.join(root, "events_jsonl")
    (
        events.select(
            F.to_json(
                F.struct(
                    "event_id",
                    F.unix_micros("ts").alias("ts_us"),
                    "user_id",
                    "event_type",
                    "value",
                )
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(staging)
    )
    good, _rejects = read_jsonl(spark, staging, EVENTS_JSONL_SCHEMA)
    return good.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.min("ts_us").alias("min_ts_us"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
            "_v"
        ),
    ).select(
        "event_type",
        "n",
        "min_id",
        "max_id",
        "min_ts_us",
        F.round("_v", 2).alias("value_sum"),
    )


JSONL_ROUNDTRIP_SQL = """
SELECT event_type,
  COUNT(*) AS n,
  MIN(event_id) AS min_id,
  MAX(event_id) AS max_id,
  MIN(epoch_us(make_timestamp(epoch_us(ts)))) AS min_ts_us,
  round(SUM(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS value_sum
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# schema evolution: additive columns across file generations
# ---------------------------------------------------------------------------


def schema_evolution_query(spark, sf_dir: str):
    """Additive schema evolution over a file table: generation 1 files
    lack a column that generation 2 adds; `mergeSchema` unifies the
    read schema and old rows surface NULLs, which the aggregation
    null-handles explicitly. This is the append-only schema-drift path
    every long-lived parquet table hits (the reject path for
    non-additive drift is schemas.py's enforced-read).

    Scale note: mergeSchema reconciles footers at planning time — the
    cost is per-FILE metadata, not per-row; pin the unified schema in
    the catalog once drift stabilizes so scans skip the reconcile pass.
    """
    import os

    from pyspark.sql import functions as F

    from .. import catalog

    orders = catalog.load_table(spark, sf_dir, "orders")
    root = artifacts.scratch_dir("schema_evo_")
    path = os.path.join(root, "orders_evolving")
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("price")
    )
    gen2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
        F.lit("v2").alias("source_version"),
    )
    gen1.write.mode("append").parquet(path)
    gen2.write.mode("append").parquet(path)
    unified = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        unified.groupBy(
            "o_orderpriority",
            F.coalesce("source_version", F.lit("v1")).alias("source_version"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.round(F.col("price") * 100).cast("long")) / 100.0).alias("rev"),
        )
        .select(
            "o_orderpriority",
            "source_version",
            "n_orders",
            F.round("rev", 2).alias("revenue"),
        )
    )


SCHEMA_EVOLUTION_SQL = """
SELECT o_orderpriority,
       CASE WHEN o_orderkey % 2 = 1 THEN 'v2' ELSE 'v1' END AS source_version,
       COUNT(*) AS n_orders,
       round(SUM(CAST(round(round(o_totalprice, 2) * 100) AS BIGINT)) / 100.0, 2)
         AS revenue
FROM orders
GROUP BY 1, 2
"""


def orc_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source format: stage events as ORC (Spark's second columnar
    native format — same pushdown/pruning machinery as parquet), read
    back with the declared schema, aggregate. The oracle aggregates the
    parquet directly, so any ORC writer/reader typing drift (timestamp
    grain, decimal width) breaks parity. Timestamps travel as exact
    integer microseconds to keep the comparison grain-free."""
    events = catalog.load_table(spark, sf_dir, "events")
    root = artifacts.scratch_dir("orc_src_")
    staging = os.path.join(root, "events_orc")
    (
        events.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .write.mode("overwrite")
        .orc(staging)
    )
    back = spark.read.schema(
        "event_id long, ts_us long, user_id long, event_type string, value double"
    ).orc(staging)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            F.min("ts_us").alias("min_ts_us"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("_v"),
        )
        .select(
            "event_type",
            "n",
            "min_id",
            "max_id",
            "min_ts_us",
            F.round("_v", 2).alias("value_sum"),
        )
    )


ORC_ROUNDTRIP_SQL = JSONL_ROUNDTRIP_SQL  # same invariant, different format
