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


CMS_D, CMS_W = 4, 256  # count-min: 4 hash rows x 256 counters
CMS_MIN_EXACT = 50  # report tokens at/above this exact frequency


def _cms_col(base_hash, d: int):
    """Row-d column for a token: derived affine rehash of one base hash
    (odd multiplier per row keeps the maps distinct), mod CMS_W."""
    return (base_hash * (2 * d + 1) + d * 7919) % CMS_W


def cms_estimate(documents: DataFrame) -> DataFrame:
    """Count-min sketch over corpus tokens, verified against the exact
    counts: the sketch is CMS_D x CMS_W integer counters — a mergeable,
    CONSTANT-size summary (4 KB here) regardless of corpus size, the
    point at 100 TB where exact per-token counts are a full token-set
    shuffle. Both the counter build (one narrow explode + one (d, col)
    agg) and the estimate (min over D counters) are deterministic
    integer arithmetic, so DuckDB replays the identical sketch and the
    one-sided error invariant (estimate >= exact, always) is part of
    the hashed output."""
    from .hashing import sha_prefix_hash

    toks = documents.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    # ONE tokenize pass (guide §2.3/§2.4): both the counter build and
    # the exact-count probe derive from the same per-token count — the
    # shared groupBy('tok') subtree becomes a ReusedExchange instead of
    # a second scan+split+explode of the whole corpus. The counters are
    # unchanged: summing per-token counts into a (d, col) cell equals
    # counting every occurrence routed to that cell, and the explode
    # now emits CMS_D structs per DISTINCT token, not per occurrence.
    tok_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_n"))
    base = sha_prefix_hash(F.col("tok"))
    cells = tok_counts.select(
        "tok_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_col(base, d).alias("col")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("c"),
    ).select("tok_n", "c.d", "c.col")
    counters = cells.groupBy("d", "col").agg(F.sum("tok_n").alias("cnt"))
    exact = tok_counts.filter(F.col("tok_n") >= CMS_MIN_EXACT).select(
        "tok", F.col("tok_n").alias("exact_n")
    )
    probes = exact.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_col(sha_prefix_hash(F.col("tok")), d).alias("col"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("tok", "exact_n", "p.d", "p.col")
    return (
        probes.join(F.broadcast(counters), ["d", "col"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
        .select(
            "tok",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("over_count"),
            (F.col("cms_n") >= F.col("exact_n")).alias("never_undercounts"),
        )
    )


def _cms_sql() -> str:
    from .hashing import sha_prefix_hash_sql

    h = sha_prefix_hash_sql("tok")
    cell_rows = "\n  UNION ALL\n  ".join(
        f"SELECT {d} AS d, ({h} * {2 * d + 1} + {d * 7919}) % {CMS_W} AS col FROM toks"
        for d in range(CMS_D)
    )
    probe_rows = "\n  UNION ALL\n  ".join(
        f"SELECT tok, exact_n, {d} AS d,"
        f" ({h} * {2 * d + 1} + {d * 7919}) % {CMS_W} AS col FROM exact"
        for d in range(CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
toks_f AS (SELECT tok FROM toks WHERE length(tok) > 0),
cells AS (
  {cell_rows.replace("FROM toks", "FROM toks_f")}
),
counters AS (
  SELECT d, col, COUNT(*) AS cnt FROM cells GROUP BY d, col
),
exact AS (
  SELECT tok, COUNT(*) AS exact_n FROM toks_f
  GROUP BY tok HAVING COUNT(*) >= {CMS_MIN_EXACT}
),
probes AS (
  {probe_rows}
)
SELECT p.tok, p.exact_n, CAST(MIN(c.cnt) AS BIGINT) AS cms_n,
       CAST(MIN(c.cnt) - p.exact_n AS BIGINT) AS over_count,
       MIN(c.cnt) >= p.exact_n AS never_undercounts
FROM probes p JOIN counters c ON p.d = c.d AND p.col = c.col
GROUP BY p.tok, p.exact_n
"""


CMS_ESTIMATE_SQL = _cms_sql()
