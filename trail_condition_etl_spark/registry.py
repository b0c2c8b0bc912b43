"""Query registry: every implemented operator from SURVEY.md §2 gets a
``queries()`` entry (Spark) and, when SQL-expressible, an ``oracle_sql()``
entry (DuckDB) producing identical rows.

Parity conventions (see also operators/weather.py docstring):
* session timezone pinned to UTC before building any plan;
* SUM/AVG over doubles computed on integer-scaled values so results are
  exact and accumulation-order independent in both engines;
* computed columns aliased identically on both sides;
* timestamps emitted as formatted strings (second precision) or epoch
  seconds, never raw timestamps (ns-vs-us type mismatch).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import catalog
from .session import ensure_engine_conf
from .operators import relational, weather

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    ensure_engine_conf(spark)
    return [catalog.load_table(spark, sf_dir, n) for n in names]


# ---------------------------------------------------------------------------
# EP3 flagship: trail-condition classification (SURVEY.md §7 step 2;
# J1/J3, P3/P9, A1-A6, §2.7 CASE rules, A8 label join)
# ---------------------------------------------------------------------------


@query("trail_classifier", oracle=weather.CLASSIFY_SQL)
def q_trail_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _tables(spark, sf_dir, "events")
    return weather.classify_events(events)


# ---------------------------------------------------------------------------
# Relational suite (SURVEY §2.3-§2.6): join/agg/window/set-op shapes
# ---------------------------------------------------------------------------


@query("pricing_summary", oracle=relational.PRICING_SUMMARY_SQL)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _tables(spark, sf_dir, "lineitem")
    return relational.pricing_summary(lineitem)


@query("shipping_priority", oracle=relational.SHIPPING_PRIORITY_SQL)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = _tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    return relational.shipping_priority(customer, orders, lineitem)


@query("region_volume", oracle=relational.REGION_VOLUME_SQL)
def q_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    dfs = _tables(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    return relational.region_volume(*dfs)


@query("order_priority", oracle=relational.ORDER_PRIORITY_SQL)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _tables(spark, sf_dir, "orders", "lineitem")
    return relational.order_priority_check(orders, lineitem)


@query("setops_nations", oracle=relational.SETOPS_SQL)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = _tables(spark, sf_dir, "customer", "supplier")
    return relational.customer_supplier_setops(customer, supplier)


@query("topk_per_group", oracle=relational.TOPK_LINEITEMS_SQL)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _tables(spark, sf_dir, "lineitem")
    return relational.topk_lineitems_per_flag(lineitem)


@query("moving_avg", oracle=relational.MOVING_AVG_SQL)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _tables(spark, sf_dir, "events")
    return relational.moving_value_avg(events)


@query("sessionize", oracle=relational.SESSIONIZE_SQL)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _tables(spark, sf_dir, "events")
    return relational.sessionize(events)


# ---------------------------------------------------------------------------
# public contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001 (driver smoke check: runs, ≥0 rows, stable schema)."""
    ensure_engine_conf(spark)
    return q_trail_classifier(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
