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
    if name == "events" and _events_ts_is_nanos(path):
        # ts is parquet TIMESTAMP(NANOS): read raw nanos, truncate to the
        # microsecond grain of Spark's TimestampType. The DuckDB oracle does
        # the same (make_timestamp(epoch_us(ts))) so both engines see
        # identical instants. Driver testdata has shipped both ns and µs
        # encodings across rounds, so the grain is sniffed from the footer.
        # The conf stays set for the session: the returned DataFrame is
        # lazy and the scan reads the conf at execution time, so it
        # cannot be restored here without breaking that execution. Any
        # LongType nano-parquet read in the same session must therefore
        # declare its own schema (as every load in this catalog does).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(EVENTS_RAW).parquet(path)
        return raw.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
        )
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)


_TS_GRAIN_CACHE: dict[str, bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """Sniff the events.ts parquet grain from the footer (driver-side,
    once per path): TIMESTAMP(NANOS) needs the raw-long truncation path,
    TIMESTAMP(MICROS) maps straight onto Spark's TimestampType."""
    cached = _TS_GRAIN_CACHE.get(path)
    if cached is None:
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(target):
            inner = [f for f in os.listdir(target) if f.endswith(".parquet")]
            if not inner:
                raise FileNotFoundError(
                    f"no .parquet part files under {target!r}; cannot sniff "
                    "the events.ts timestamp grain"
                )
            target = os.path.join(target, sorted(inner)[0])
        ts_type = pq.read_schema(target).field("ts").type
        cached = _TS_GRAIN_CACHE[path] = str(ts_type).startswith("timestamp[ns")
    return cached


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load every testdata table into a dict keyed by table name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all testdata tables as temp views for spark.sql paths."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
