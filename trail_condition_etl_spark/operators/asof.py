"""As-of (point-in-time) join — [EXT] operator the reference lacks
(SURVEY.md §2.3: "as-of join via union+window").

`asof_join_backward(left, right, key, ts)`: for each left row, attach the
most recent right row with right.ts <= left.ts for the same key.

Implementation is the scalable union+window pattern, NOT a range
cross-join: tag both sides, union, sort per key by (ts, side), and carry
the last-seen right row forward with last_value(..., ignorenulls). One
shuffle on the key, linear state — survives arbitrarily dense right
sides, where a range-join would explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join; ties (equal ts) match the right row (the
    right side sorts before the left at the same timestamp).

    `tiebreak` names a column present in BOTH frames that makes the sort
    total (e.g. each side's own event id); without it, rows sharing
    (key, ts, side) carry an engine-dependent order."""
    lcols = left.columns
    l_tag = left.withColumn("_is_right", F.lit(0))
    r_tag = right.select(
        key, ts, *right_value_cols, *([tiebreak] if tiebreak and tiebreak not in right_value_cols and tiebreak not in (key, ts) else [])
    ).withColumn("_is_right", F.lit(1))
    # align schemas for the union
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    for c in r_tag.columns:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    order = [F.col(ts), F.col("_is_right").desc()]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "_is_right",
        *[
            F.last(F.when(F.col("_is_right") == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
        F.last(F.when(F.col("_is_right") == 1, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias(f"{ts}{suffix}"),
    )
    return carried.filter(F.col("_is_right") == 0).drop("_is_right")


def last_purchase_before_error(events: DataFrame) -> DataFrame:
    """As-of demo on the events stream: for each 'error' event, the most
    recent 'purchase' by the same user at-or-before the error. Output is
    oracle-checkable (same union+window expressed in SQL)."""
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.col("event_id").alias("_ord")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        "ts",
        F.col("value").alias("p_value"),
        F.col("event_id").alias("_ord"),
    )
    joined = asof_join_backward(
        errors,
        purchases,
        key="user_id",
        ts="ts",
        right_value_cols=["p_event_id", "p_value"],
        tiebreak="_ord",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
        F.col("p_event_id_asof").alias("last_purchase_event_id"),
        F.round("p_value_asof", 2).alias("last_purchase_value"),
        (
            F.col("ts").cast("long") - F.col("ts_asof").cast("long")
        ).alias("seconds_since_purchase"),
    )


ASOF_SQL = """
WITH events_us AS (
  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type,
         value
  FROM events
),
tagged AS (
  SELECT event_id, user_id, ts, 0 AS is_right,
         NULL::BIGINT AS p_event_id, NULL::DOUBLE AS p_value,
         event_id AS _ord
  FROM events_us WHERE event_type = 'error'
  UNION ALL
  SELECT event_id, user_id, ts, 1 AS is_right, event_id, value,
         event_id AS _ord
  FROM events_us WHERE event_type = 'purchase'
),
carried AS (
  SELECT *,
    last_value(CASE WHEN is_right = 1 THEN p_event_id END IGNORE NULLS)
      OVER w AS last_purchase_event_id,
    last_value(CASE WHEN is_right = 1 THEN p_value END IGNORE NULLS)
      OVER w AS last_purchase_value,
    last_value(CASE WHEN is_right = 1 THEN ts END IGNORE NULLS)
      OVER w AS last_purchase_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_right DESC, _ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
  last_purchase_event_id,
  round(last_purchase_value, 2) AS last_purchase_value,
  (epoch_us(ts) // 1000000) - (epoch_us(last_purchase_ts) // 1000000)
      AS seconds_since_purchase
FROM carried WHERE is_right = 0
"""


ASOF_TOLERANCE_S = 3600


def last_purchase_before_error_within(
    events: DataFrame, tolerance_s: int = ASOF_TOLERANCE_S
) -> DataFrame:
    """Tolerance-bounded as-of (pandas merge_asof's `tolerance`): the
    match is kept only when the right row is no STALER than
    `tolerance_s` — an attribution window, expressed as a residual
    NULL-out over the same union+window carry (the staleness check
    cannot prune the carry itself: the most recent purchase is only
    known after the window pass). Same single key shuffle as the
    unbounded form."""
    joined = last_purchase_before_error(events)
    fresh = F.col("seconds_since_purchase") <= tolerance_s
    return joined.select(
        "event_id",
        "user_id",
        "error_ts",
        F.when(fresh, F.col("last_purchase_event_id")).alias(
            "last_purchase_event_id"
        ),
        F.when(fresh, F.col("last_purchase_value")).alias(
            "last_purchase_value"
        ),
        F.when(fresh, F.col("seconds_since_purchase")).alias(
            "seconds_since_purchase"
        ),
        F.coalesce(fresh, F.lit(False)).alias("within_tolerance"),
    )


ASOF_TOLERANCE_SQL = f"""
WITH base AS ({ASOF_SQL})
SELECT event_id, user_id, error_ts,
  CASE WHEN seconds_since_purchase <= {ASOF_TOLERANCE_S}
       THEN last_purchase_event_id END AS last_purchase_event_id,
  CASE WHEN seconds_since_purchase <= {ASOF_TOLERANCE_S}
       THEN last_purchase_value END AS last_purchase_value,
  CASE WHEN seconds_since_purchase <= {ASOF_TOLERANCE_S}
       THEN seconds_since_purchase END AS seconds_since_purchase,
  COALESCE(seconds_since_purchase <= {ASOF_TOLERANCE_S}, FALSE)
    AS within_tolerance
FROM base
"""
