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
from .operators import weather

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
