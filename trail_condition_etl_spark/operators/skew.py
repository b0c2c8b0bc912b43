"""Explicit key-salting for skewed joins.

AQE's skew-join split (on in session.py) handles sort-merge skew at
runtime by splitting oversized partitions, but it cannot apply to
stream-static joins, to pre-shuffled/bucketed layouts, or when one hot
key must be spread across MORE executors than its single partition's
file splits allow. The classic fix is salting: append a salt in
[0, n_salts) to the big side's key, replicate the small/medium side once
per salt value, and join on (key, salt) — the hot key's rows land on
n_salts partitions instead of one.

The testdata `events` table is the honest skew case: millions of rows
over 10 distinct user_ids, so an unsalted shuffle on user_id puts 10%
of the table in each of 10 partitions regardless of cluster size.

Salt choice: `pmod(xxhash64(unique_col), n)` — deterministic (replay-
safe, unlike rand()) and uniform. The replicated side gets
`explode(sequence(0, n-1))`, a narrow n× fan-out that stays tiny as
long as that side is the dimension."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salt_column(unique_col: str | Column, n_salts: int = DEFAULT_SALTS) -> Column:
    """Deterministic salt in [0, n_salts) derived from a per-row unique
    column of the big side."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def replicate_for_salts(dim: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Replicate the small side once per salt value (narrow fan-out)."""
    return dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Join `big` (skewed on `key`) with `dim` on (key, salt). Output
    columns match the unsalted `big.join(dim, key)` — the salt is
    internal. The `merge` hint keeps the demo shuffle-shaped (a
    broadcast dim would sidestep skew anyway; salting is for the case
    where the non-skewed side exceeds the broadcast threshold)."""
    big_s = big.withColumn("_salt", salt_column(unique_col, n_salts))
    dim_s = replicate_for_salts(dim, n_salts)
    return (
        big_s.hint("merge")
        .join(dim_s, [key, "_salt"], how)
        .drop("_salt")
    )


def skewed_user_enrichment(events: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Registered-query form: enrich the skewed events table with a
    per-user dimension (derived from events itself — profile stats),
    via the salted join, then re-aggregate so the output is compact and
    deterministic. Equivalent to the plain join+group the oracle runs."""
    dim = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_total_events"),
    )
    enriched = salted_join(events, dim, "user_id", "event_id", n_salts)
    return (
        enriched.groupBy("user_id", "user_total_events")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .select("user_id", "user_total_events", "n_events", "n_types")
    )


SKEW_JOIN_SQL = """
WITH dim AS (
  SELECT user_id, COUNT(*) AS user_total_events FROM events GROUP BY user_id
)
SELECT e.user_id, d.user_total_events,
  COUNT(*) AS n_events,
  COUNT(DISTINCT e.event_type) AS n_types
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.user_id, d.user_total_events
"""
