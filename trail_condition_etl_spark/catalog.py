"""Table catalog: load the driver-generated parquet tables with explicit
schemas (SURVEY.md §1.3 — never `inferSchema` in a production path).

`load_table` applies the declared StructType so Catalyst gets stable types
for pruning/pushdown, and so a schema drift in the files fails loudly at
read time instead of silently at aggregation time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from .schemas import EVENTS_RAW, TESTDATA_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = tuple(TESTDATA_SCHEMAS.keys())


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its declared schema."""
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS): read raw nanos, truncate to the
        # microsecond grain of Spark's TimestampType. The DuckDB oracle does
        # the same (make_timestamp(epoch_us(ts))) so both engines see
        # identical instants.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(EVENTS_RAW).parquet(path)
        return raw.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
        )
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load every testdata table into a dict keyed by table name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all testdata tables as temp views for spark.sql paths."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
