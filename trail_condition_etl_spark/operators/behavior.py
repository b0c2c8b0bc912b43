"""Behavioral analytics over the event log: conversion funnels and
retention cohorts — the two queries every event pipeline grows within a
week of existing. The reference's classifier consumes per-city windows
(SURVEY §2.4); these are the same windowed-consumption shapes turned on
user behavior.

Scale notes:
* the funnel is three grouped aggregations on user_id — AQE reuses the
  user clustering across stages, and each stage's output is one row per
  user (monotonically shrinking);
* cohorts are two aggs: per-user first-day (one row per user), then a
  (cohort_day, offset) rollup whose distinct-user count is exact because
  the first agg already reduced to one row per (user, active day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FUNNEL_STEPS = ("view", "click", "purchase")
STEP_WINDOW_MINUTES = 60  # each step must follow within the hour


def conversion_funnel(events: DataFrame) -> DataFrame:
    """Ordered 3-step funnel per user: first view, first click within
    an hour of that view, first purchase within an hour of that click;
    counts per reached stage.

    Each stage is a conditional MIN keyed by user — a cascade of three
    grouped aggs joined back (the ts comparisons need the previous
    stage's anchor). Emits one row per funnel depth with user counts.
    """
    v, c, p = FUNNEL_STEPS
    step_us = STEP_WINDOW_MINUTES * 60 * 1_000_000
    # ONE shuffle: collect each user's per-step timestamp array (µs),
    # then the sequential-anchor logic is narrow array math. The
    # aggregation-per-stage + join-back formulation evaluates the event
    # scan once per stage and re-joins; this evaluates it once, total.
    typed = events.filter(F.col("event_type").isin(v, c, p)).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tu")
    )

    def step_times(etype: str) -> Column:
        return F.collect_list(
            F.when(F.col("event_type") == etype, F.col("tu"))
        )

    per_user = typed.groupBy("user_id").agg(
        step_times(v).alias("views"),
        step_times(c).alias("clicks"),
        step_times(p).alias("purchases"),
    )
    t1 = F.array_min("views")
    t2 = F.array_min(
        F.filter("clicks", lambda x: (x > t1) & (x <= t1 + F.lit(step_us)))
    )
    t3c = F.col("_t2")
    return (
        per_user.filter(F.size("views") > 0)
        .withColumn("_t2", t2)
        .withColumn(
            "_t3",
            F.array_min(
                F.filter(
                    "purchases", lambda x: (x > t3c) & (x <= t3c + F.lit(step_us))
                )
            ),
        )
        .select(
            (
                F.lit(1)
                + F.col("_t2").isNotNull().cast("int")
                + F.col("_t3").isNotNull().cast("int")
            ).alias("funnel_depth")
        )
        .groupBy("funnel_depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


CONVERSION_FUNNEL_SQL = """
WITH events_us AS (
  SELECT user_id, event_type, make_timestamp(epoch_us(ts)) AS ts FROM events
),
t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events_us
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events_us e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.t1
    AND e.ts <= t1.t1 + INTERVAL 60 MINUTE
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events_us e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
    AND e.ts <= t2.t2 + INTERVAL 60 MINUTE
  GROUP BY e.user_id
)
SELECT 1 + CAST(t2.user_id IS NOT NULL AS INT)
         + CAST(t3.user_id IS NOT NULL AS INT) AS funnel_depth,
       COUNT(*) AS n_users
FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
GROUP BY 1
"""


def retention_cohorts(events: DataFrame, max_offset_days: int = 14) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-active day,
    counted on each later active day (offset in days, capped). The
    distinct-user count per cell is exact without a distinct aggregate:
    the per-(user, day) reduction happens in the first groupBy."""
    active = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first = active.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        active.join(first, "user_id")
        .withColumn("offset_days", F.datediff("day", "cohort_day"))
        .filter(F.col("offset_days") <= max_offset_days)
        .groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "offset_days",
            "n_users",
        )
    )


RETENTION_COHORTS_SQL = """
WITH active AS (
  SELECT DISTINCT user_id, CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day
  FROM events
),
first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY user_id
)
SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
       offset_days, COUNT(*) AS n_users
FROM (
  SELECT f.cohort_day, date_diff('day', f.cohort_day, a.day) AS offset_days
  FROM active a JOIN first f USING (user_id)
) a
WHERE offset_days <= 14
GROUP BY 1, 2
"""


def gap_fill_daily(events: DataFrame) -> DataFrame:
    """Time-series resampling: per-user daily value totals on a complete
    date spine (min..max active day per user), gaps forward-filled with
    the last observed value. The spine⟕daily join is the fused one-pass
    form (timeseries.filled_days, r14): the fact aggregates ONCE and the
    fill is one `last(ignoreNulls)` window over the same (user, day)
    clustering.
    """
    from .timeseries import filled_days

    daily = (
        events.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg((F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("v"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        filled_days(daily, "v")
        .withColumn("filled_v", F.last("v", ignorenulls=True).over(w))
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("v").isNull().alias("is_filled"),
            F.round("filled_v", 2).alias("value_sum"),
        )
    )


GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
         SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
       d.v IS NULL AS is_filled,
       round(last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_sum
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: (prev_type -> type) counts and row-normalized transition
    probabilities. One (user_id, ts) window for the lag, one count agg;
    the per-prev-type totals are a second tiny aggregate joined back
    broadcast — 25 cells, never a partition-less window."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("to_type"),
        )
        .withColumn("from_type", F.lag("to_type").over(by_user))
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("row_n"), 6).alias("p"),
        )
    )


EVENT_TRANSITIONS_SQL = """
WITH events_us AS (
  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type
  FROM events
),
pairs AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events_us
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
),
totals AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_n FROM counts GROUP BY 1
)
SELECT c.from_type, c.to_type, c.n,
       round(c.n / CAST(t.row_n AS DOUBLE), 6) AS p
FROM counts c JOIN totals t USING (from_type)
"""


def cumulative_users(events: DataFrame) -> DataFrame:
    """Running DISTINCT-user count per day — without a distinct agg or
    windowed state: a user contributes from their first-seen day
    onward, so cumulative_users(d) = count of users with first_day <= d.
    Two tiny aggs (first day per user, users per first-day) and one
    cumulative sum over the ~30-row daily series; the cumulative window
    is partitioned by a constant-free single day series but its input
    is already reduced to one row per day, so no data-sized global sort
    exists anywhere."""
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = first.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    # daily activity series for context (events per calendar day)
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    joined = daily.join(
        per_day, daily.day == per_day.first_day, "left"
    ).select(
        "day", "n_events", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


CUMULATIVE_USERS_SQL = """
WITH events_us AS (
  SELECT make_timestamp(epoch_us(ts)) AS ts, user_id FROM events
),
first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events_us GROUP BY user_id
),
per_day AS (
  SELECT first_day, COUNT(*) AS new_users FROM first GROUP BY first_day
),
daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events_us GROUP BY 1
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.n_events,
       COALESCE(p.new_users, 0) AS new_users,
       CAST(SUM(COALESCE(p.new_users, 0)) OVER (
         ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cumulative_users
FROM daily d LEFT JOIN per_day p ON d.day = p.first_day
"""


def event_affinity(events: DataFrame) -> DataFrame:
    """Market-basket affinity between event types: baskets are (user,
    day) activity sets, scored with lift = P(a,b) / (P(a)P(b)). The
    basket reduction is one grouped collect_set; pair expansion is
    narrow (baskets hold at most the 5 distinct types); the marginals
    and basket count are tiny re-aggregates broadcast back. Counts stay
    integers end-to-end — the one lift division is the only float."""
    baskets = events.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    singles = (
        baskets.select(F.explode("types").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_single"))
    )
    pairs = (
        baskets.select(F.explode("types").alias("a"), "types")
        .select("a", F.explode("types").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("t").alias("a"), F.col("n_single").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(singles.select(F.col("t").alias("b"), F.col("n_single").alias("n_b"))),
            "b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "a",
            "b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_pair").cast("double") * F.col("n_baskets"))
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


EVENT_AFFINITY_SQL = """
WITH baskets AS (
  SELECT user_id, CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
         list_sort(list_distinct(list(event_type))) AS types
  FROM events GROUP BY 1, 2
),
n_b AS (SELECT COUNT(*) AS n_baskets FROM baskets),
singles AS (
  SELECT t, COUNT(*) AS n_single
  FROM (SELECT unnest(types) AS t FROM baskets) GROUP BY t
),
pairs AS (
  SELECT a, b, COUNT(*) AS n_pair FROM (
    SELECT x.a, y.b FROM
      (SELECT user_id, day, unnest(types) AS a FROM baskets) x
      JOIN (SELECT user_id, day, unnest(types) AS b FROM baskets) y
        ON x.user_id = y.user_id AND x.day = y.day AND x.a < y.b
  ) GROUP BY a, b
)
SELECT p.a, p.b, p.n_pair, sa.n_single AS n_a, sb.n_single AS n_b,
  round((CAST(p.n_pair AS DOUBLE) * n_b.n_baskets)
        / (CAST(sa.n_single AS DOUBLE) * sb.n_single), 6) AS lift
FROM pairs p
JOIN singles sa ON sa.t = p.a
JOIN singles sb ON sb.t = p.b
CROSS JOIN n_b
"""


def time_to_convert(events: DataFrame) -> DataFrame:
    """Funnel latency: for users whose first click follows their first
    view within the step window (see `conversion_funnel`), the
    view->click delay in seconds — count, extremes, and interpolated
    median/p90 (exact `percentile`; at 100 TB swap approx_percentile,
    same plan shape, like `winsorize_values`). One user-keyed agg
    produces a row per converting user; the stats agg is 1-row."""
    v, c, _ = FUNNEL_STEPS
    step_us = STEP_WINDOW_MINUTES * 60 * 1_000_000
    typed = events.filter(F.col("event_type").isin(v, c)).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tu")
    )
    per_user = typed.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == v, F.col("tu"))).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == c, F.col("tu"))
        ).alias("clicks"),
    )
    t1 = F.col("t1")
    t2 = F.array_min(
        F.filter("clicks", lambda x: (x > t1) & (x <= t1 + F.lit(step_us)))
    )
    deltas = (
        per_user.filter(t1.isNotNull())
        .withColumn("_t2", t2)
        .filter(F.col("_t2").isNotNull())
        .select(((F.col("_t2") - t1) / 1_000_000).cast("long").alias("delta_s"))
    )
    return deltas.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.min("delta_s").alias("min_s"),
        F.max("delta_s").alias("max_s"),
        F.round(F.expr("percentile(delta_s, 0.5)"), 4).alias("median_s"),
        F.round(F.expr("percentile(delta_s, 0.9)"), 4).alias("p90_s"),
    )


TIME_TO_CONVERT_SQL = """
WITH events_us AS (
  SELECT user_id, event_type, epoch_us(ts) AS tu FROM events
  WHERE event_type IN ('view', 'click')
),
t1 AS (
  SELECT user_id, MIN(tu) AS t1 FROM events_us
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.tu) AS t2
  FROM events_us e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.tu > t1.t1
    AND e.tu <= t1.t1 + 3600000000::BIGINT
  GROUP BY e.user_id
),
deltas AS (
  SELECT (t2.t2 - t1.t1) // 1000000 AS delta_s
  FROM t1 JOIN t2 USING (user_id)
)
SELECT COUNT(*) AS n_converters,
  MIN(delta_s) AS min_s, MAX(delta_s) AS max_s,
  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY delta_s), 4) AS median_s,
  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY delta_s), 4) AS p90_s
FROM deltas
"""
