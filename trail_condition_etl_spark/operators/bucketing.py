"""Bucketed (co-located) joins: the 100 TB fact-fact join strategy.

The reference never joins two large tables — its joins are task×dim
lookups (SURVEY.md §2.4, J1/J2) — but at 100 TB the dominant cost in any
lineitem⋈orders-shaped query is the pairwise shuffle of BOTH fact
tables. Spark's answer is bucketing: write each table hash-clustered
into the same number of buckets on the join key
(`df.write.bucketBy(n, key).sortBy(key).saveAsTable(...)`), after which
every join on that key reads matching buckets directly — the sort-merge
join runs with ZERO Exchange on either side, and re-runs amortize the
one-time layout cost across every downstream query.

This module owns that layout step and a canonical co-located join.
tests/test_plans.py pins the plan shape: bucketed scan on both sides,
no Exchange under the join, exactly one Exchange total (the final
aggregation).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import artifacts
from .. import catalog
from .relational import _scaled

DEFAULT_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    n_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed (+ optionally sort-within-bucket)
    parquet table. On a cluster this is the one-time layout job; `path`
    makes the table external so the data lands on the governed prefix
    rather than the session warehouse."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*(sort_cols or keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def ensure_bucketed_fact_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = DEFAULT_BUCKETS
) -> tuple[str, str]:
    """Lay out lineitem and orders bucketed by order key (same bucket
    count on both sides — the co-location contract). Idempotent per
    session run; external paths under a temp root stand in for the
    cluster's curated bucketed zone."""
    root = artifacts.scratch_dir("bucketed_facts_")
    li_name, ord_name = "bucketed_lineitem", "bucketed_orders"
    write_bucketed(
        catalog.load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        li_name,
        ["l_orderkey"],
        n_buckets,
        path=os.path.join(root, li_name),
    )
    write_bucketed(
        catalog.load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        ord_name,
        ["o_orderkey"],
        n_buckets,
        path=os.path.join(root, ord_name),
    )
    return li_name, ord_name


def colocated_join(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Fact⋈fact on the bucket key. The `merge` hint pins sort-merge so
    the plan demonstrates the bucketed case (a broadcast would also skip
    the shuffle, but only below the broadcast threshold — at 100 TB
    neither side broadcasts). Bucket-co-located inputs make both
    Exchanges vanish; revenue aggregates per order priority."""
    joined = lineitem.hint("merge").join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (
                F.sum(
                    _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                )
                / 10000.0
            ).alias("rev"),
        )
        .select(
            "o_orderpriority",
            "n_items",
            F.round("rev", 4).alias("revenue"),
        )
    )


def bucketed_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-query form: lay out the bucketed tables, then run the
    co-located join reading them back (bucketed scans, shuffle-free
    join)."""
    li_name, ord_name = ensure_bucketed_fact_tables(spark, sf_dir)
    return colocated_join(spark.table(li_name), spark.table(ord_name))


BUCKETED_JOIN_SQL = """
SELECT o_orderpriority,
  COUNT(*) AS n_items,
  round(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
        / 10000.0, 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""
