"""Approximate (sketch) aggregation: HyperLogLog distinct counts and
KLL/GK approximate quantiles — the aggregation strategy that actually
runs at 100 TB, where exact COUNT(DISTINCT) is a full shuffle of every
distinct key and exact percentiles are a global sort.

Spark's built-ins (`approx_count_distinct`, `percentile_approx`) are
mergeable sketches: map-side partials of bounded size combine
associatively, so the shuffle carries kilobytes per group instead of the
key set itself. Exact variants are kept alongside for the oracle and for
small-scale validation.

Oracle discipline for approximate results: the sketch VALUE is not
portable across engines (DuckDB's HLL differs from Spark's), so the
registered queries emit the EXACT answer plus a boolean asserting the
sketch landed within tolerance; the DuckDB oracle recomputes the exact
answer and asserts literal TRUE. A sketch regression (accuracy bug,
parameter drift) flips the boolean and fails the value-hash — the same
verification pattern as the ANN recall floors (tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_RSD = 0.02  # relative standard deviation for approx_count_distinct
HLL_TOLERANCE = 0.05  # assertion bound: |approx - exact| / exact
QUANTILE_ACCURACY = 10_000  # percentile_approx accuracy parameter
QUANTILE_TOLERANCE = 0.02  # assertion bound relative to the exact value


def approx_distinct_check(events: DataFrame) -> DataFrame:
    """Per event type: exact distinct users plus an in-plan assertion
    that the HLL estimate lands within HLL_TOLERANCE of it. At scale the
    exact branch is dropped and the sketch IS the answer; here the exact
    value doubles as the oracle anchor."""
    agg = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("n_approx"),
    )
    err = F.abs(F.col("n_approx") - F.col("n_exact")) / F.col("n_exact")
    return agg.select(
        "event_type",
        "n_exact",
        (err <= HLL_TOLERANCE).alias("hll_within_tol"),
    )


APPROX_DISTINCT_SQL = """
SELECT event_type,
  COUNT(DISTINCT user_id) AS n_exact,
  TRUE AS hll_within_tol
FROM events
GROUP BY event_type
"""


def approx_quantile_check(events: DataFrame) -> DataFrame:
    """Per event type: exact p50/p95 of `value` (percentile_cont
    interpolation — identical definition in DuckDB's quantile_cont) plus
    a RANK-based assertion on the mergeable sketch: the fraction of rows
    at or below the sketch's answer must sit within QUANTILE_TOLERANCE
    (plus a 2/n discreteness allowance) of the requested quantile. Rank
    error is what GK/KLL-style sketches actually guarantee — a
    value-distance check would be distribution-dependent (a sparse tail
    makes adjacent order statistics arbitrarily far apart).

    The validation branch (exact percentiles + the rank-check join) is
    what you drop at 100 TB; the sketch aggregation itself stays a
    single-shuffle partial+final plan."""
    sk = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("percentile(value, 0.95)").alias("p95_exact"),
        F.percentile_approx(
            "value", [0.5, 0.95], QUANTILE_ACCURACY
        ).alias("_ap"),
        F.count(F.lit(1)).alias("n"),
    )
    ranked = events.join(F.broadcast(sk), "event_type").groupBy(
        "event_type"
    ).agg(
        F.first("p50_exact").alias("p50_exact"),
        F.first("p95_exact").alias("p95_exact"),
        F.first("n").alias("n"),
        F.sum((F.col("value") <= F.col("_ap")[0]).cast("long")).alias("r50"),
        F.sum((F.col("value") <= F.col("_ap")[1]).cast("long")).alias("r95"),
    )
    tol = F.lit(QUANTILE_TOLERANCE) + 2.0 / F.col("n")
    ok = (
        F.abs(F.col("r50") / F.col("n") - 0.5) <= tol
    ) & (F.abs(F.col("r95") / F.col("n") - 0.95) <= tol)
    return ranked.select(
        "event_type",
        F.round("p50_exact", 6).alias("p50"),
        F.round("p95_exact", 6).alias("p95"),
        ok.alias("sketch_within_tol"),
    )


APPROX_QUANTILE_SQL = """
SELECT event_type,
  round(quantile_cont(value, 0.5), 6) AS p50,
  round(quantile_cont(value, 0.95), 6) AS p95,
  TRUE AS sketch_within_tol
FROM events
GROUP BY event_type
"""
