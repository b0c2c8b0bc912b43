"""Idempotent upsert + DLQ sinks over plain parquet.

The reference's sinks are HTTP POSTs with server-side upsert semantics
(S10: fetch-weather/src/weather.py:25-32, upsert claim DESIGN.md:41;
S13: categorize-trail-conditions/src/client.py:64-74) — redelivery-safe by
construction. Plain parquet has no MERGE, so the engine implements
partition-scoped read-merge-overwrite (SURVEY.md §7 "Idempotent MERGE
without Delta"):

* the table is hash-partitioned on the merge key into `pk_bucket=NNN`
  directories at write time;
* an upsert computes which buckets its rows touch, reads ONLY those
  buckets, anti-joins old vs new on the key, and overwrites just the
  touched bucket directories (dynamic partition overwrite).

At 100 TB this means an upsert's IO is proportional to the touched
buckets, not the table; with Delta/Iceberg available the same call site
becomes `MERGE INTO` and nothing upstream changes. Re-running the same
batch yields byte-identical table state => at-least-once delivery becomes
effectively-once (T1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def _with_bucket(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(
        "pk_bucket", F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
    )


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    new_rows: DataFrame,
    keys: list[str],
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """MERGE-style upsert keyed on `keys`: new rows win over existing
    rows with the same key; untouched buckets are not rewritten."""
    new_b = _with_bucket(new_rows, keys, n_buckets)
    if not os.path.exists(table_path):
        (
            new_b.dropDuplicates(keys)
            .write.partitionBy("pk_bucket")
            .mode("overwrite")
            .parquet(table_path)
        )
        return
    touched = [r.pk_bucket for r in new_b.select("pk_bucket").distinct().collect()]
    existing = spark.read.parquet(table_path).filter(
        F.col("pk_bucket").isin(touched)
    )
    kept = existing.join(new_b.select(*keys).distinct(), keys, "left_anti")
    merged = kept.unionByName(new_b.dropDuplicates(keys))
    # dynamic partition overwrite: only the touched pk_bucket dirs rewrite
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged.write.partitionBy("pk_bucket").mode("overwrite").parquet(table_path)


def read_upsert_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read an upsert table, dropping the bucketing column."""
    return spark.read.parquet(table_path).drop("pk_bucket")


def append_dlq(
    spark: SparkSession,
    dlq_path: str,
    rejects: DataFrame,
) -> None:
    """S14: append failed rows (payload + ExceptionDetails struct) to the
    quarantine path. Append-only: DLQ entries are an audit log, a redrive
    job filters `error.safe_to_retry` and re-submits."""
    rejects.withColumn("dlq_ts", F.current_timestamp()).write.mode(
        "append"
    ).parquet(dlq_path)


def redrive_candidates(spark: SparkSession, dlq_path: str) -> DataFrame:
    """Rows eligible for redrive (R4: retryable flag drives redrive)."""
    return spark.read.parquet(dlq_path).filter(F.col("error.safe_to_retry"))
