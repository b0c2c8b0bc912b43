"""Warehouse data-quality checks (the Great-Expectations-style suite a
production pipeline runs before publishing a table): referential
integrity, key uniqueness, null keys, value domains, and business-rule
violations, emitted as one (check, n_violations, passed) frame.

The reference validates per-ROW at ingest (Pydantic + DLQ, P7/S14 —
fetch-weather/src/api.py:41-141); this is the complementary per-TABLE
contract check that batch warehouses need: a row can be locally valid
while the table breaks an invariant (an orphaned FK, a duplicate key, a
date inversion) that no single-row validator can see.

Plan shape: each check is one aggregate (anti-join counts for FKs,
group-HAVING for uniqueness, predicate counts for domains), unioned as
1-row frames. At 100 TB each check is a scan + one keyed shuffle at
most; checks share no state so they parallelize as independent jobs —
and the counts double as freshness/regression metrics run-over-run.

On the driver's synthetic data two checks report real violations
(duplicate lineitem keys, ship-before-order inversions) — the suite
measures the data, it does not assume it is clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDER_PRIORITIES = (
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
)


def _check(name: str, n_violations) -> DataFrame:
    return n_violations.select(
        F.lit(name).alias("check"),
        F.col("n").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def dq_checks(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
) -> DataFrame:
    """Run the warehouse contract suite; one row per check."""
    cnt = F.count(F.lit(1)).alias("n")

    fk_orders = orders.join(
        F.broadcast(customer.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    ).agg(cnt)
    fk_lineitem = lineitem.join(
        orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_anti",
    ).agg(cnt)
    dup_keys = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(cnt)
    )
    ship_inversion = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(cnt)
    )
    null_keys = events.filter(
        F.col("event_id").isNull()
        | F.col("user_id").isNull()
        | F.col("ts").isNull()
    ).agg(cnt)
    qty_range = lineitem.filter(
        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
    ).agg(cnt)
    prio_domain = orders.filter(
        ~F.col("o_orderpriority").isin(*ORDER_PRIORITIES)
    ).agg(cnt)

    out = _check("1_fk_orders_customer", fk_orders)
    for name, frame in [
        ("2_fk_lineitem_orders", fk_lineitem),
        ("3_unique_lineitem_key", dup_keys),
        ("4_ship_not_before_order", ship_inversion),
        ("5_event_keys_not_null", null_keys),
        ("6_quantity_in_range", qty_range),
        ("7_priority_in_domain", prio_domain),
    ]:
        out = out.unionByName(_check(name, frame))
    return out


DQ_CHECKS_SQL = """
WITH checks(check_name, n) AS (
  SELECT '1_fk_orders_customer', (
    SELECT COUNT(*) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
  UNION ALL SELECT '2_fk_lineitem_orders', (
    SELECT COUNT(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL SELECT '3_unique_lineitem_key', (
    SELECT COUNT(*) FROM (
      SELECT l_orderkey, l_linenumber FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
  UNION ALL SELECT '4_ship_not_before_order', (
    SELECT COUNT(*) FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate < o.o_orderdate)
  UNION ALL SELECT '5_event_keys_not_null', (
    SELECT COUNT(*) FROM events
    WHERE event_id IS NULL OR user_id IS NULL OR ts IS NULL)
  UNION ALL SELECT '6_quantity_in_range', (
    SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
  UNION ALL SELECT '7_priority_in_domain', (
    SELECT COUNT(*) FROM orders WHERE o_orderpriority NOT IN
      ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'))
)
SELECT check_name AS "check", CAST(n AS BIGINT) AS n_violations,
       n = 0 AS passed
FROM checks
"""


VOLUME_WINDOW_DAYS = 7
VOLUME_ALERT_RATIO = 0.5  # alert when a day falls below half the trailing avg


def volume_monitor(events: DataFrame) -> DataFrame:
    """Pipeline-health monitoring as a query: daily row counts compared
    to the trailing 7-day average — the freshness/volume check every
    warehouse runs against every ingested table. One daily aggregation;
    the trailing comparison windows over the ~30-row day series, so the
    monitor costs one scan regardless of table size. The ratio division
    is the only float (identical operands both engines)."""
    from pyspark.sql import Window

    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("day")
        .rowsBetween(-VOLUME_WINDOW_DAYS, -1)
    )
    trailing = F.sum("n_rows").over(w)
    n_prev = F.count("n_rows").over(w)
    ratio = F.col("n_rows") / (F.col("_trail") / F.col("_nprev"))
    return (
        daily.withColumn("_trail", trailing)
        .withColumn("_nprev", n_prev)
        .filter(F.col("_nprev") > 0)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_rows",
            F.col("_trail").alias("trailing_rows"),
            F.col("_nprev").cast("long").alias("n_trailing_days"),
            F.round(ratio, 6).alias("volume_ratio"),
            (ratio < VOLUME_ALERT_RATIO).alias("volume_alert"),
        )
    )


VOLUME_MONITOR_SQL = f"""
WITH daily AS (
  SELECT CAST(make_timestamp(epoch_us(ts)) AS DATE) AS day,
         COUNT(*) AS n_rows
  FROM events GROUP BY 1
),
trail AS (
  SELECT day, n_rows,
    CAST(SUM(n_rows) OVER w AS BIGINT) AS trailing_rows,
    COUNT(n_rows) OVER w AS n_trailing_days
  FROM daily
  WINDOW w AS (ORDER BY day
               ROWS BETWEEN {VOLUME_WINDOW_DAYS} PRECEDING AND 1 PRECEDING)
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_rows, trailing_rows,
       n_trailing_days,
       round(n_rows / (trailing_rows / CAST(n_trailing_days AS DOUBLE)), 6)
         AS volume_ratio,
       n_rows / (trailing_rows / CAST(n_trailing_days AS DOUBLE))
         < {VOLUME_ALERT_RATIO} AS volume_alert
FROM trail WHERE n_trailing_days > 0
"""


def table_checksum(lineitem: DataFrame) -> DataFrame:
    """Whole-table content checksum: an order-independent integer
    fingerprint (sum of per-row sha2-prefix hashes + count) — the
    primitive behind "did the migration/backfill produce the same
    table" at 100 TB, where row-by-row comparison is a full shuffle of
    both tables but a checksum is one aggregation on each side. String
    concatenation pins column order; integer sums make it partition-
    and engine-independent."""
    from .hashing import sha_prefix_hash

    # integer-only reprs: double->string formatting is engine-specific
    # (Java scientific notation vs shortest-round-trip), so numeric
    # columns enter the repr as exact integer (cents) strings
    row_repr = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.round(F.col("l_quantity")).cast("long").cast("string"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    )
    h = sha_prefix_hash(row_repr)
    return lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).alias("checksum_sum"),
        F.min(h).alias("checksum_min"),
        F.max(h).alias("checksum_max"),
    )


def _table_checksum_sql() -> str:
    from .hashing import sha_prefix_hash_sql

    repr_sql = (
        "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
        " || '|' || CAST(CAST(round(l_quantity) AS BIGINT) AS VARCHAR)"
        " || '|' || CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)"
        " || '|' || l_returnflag || '|' || l_linestatus"
    )
    h = sha_prefix_hash_sql(f"({repr_sql})")
    return f"""
SELECT COUNT(*) AS n_rows,
  CAST(SUM({h}) AS BIGINT) AS checksum_sum,
  MIN({h}) AS checksum_min,
  MAX({h}) AS checksum_max
FROM lineitem
"""


TABLE_CHECKSUM_SQL = _table_checksum_sql()
