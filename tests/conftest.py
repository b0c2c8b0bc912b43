"""Shared fixtures: one SparkSession per test session, DuckDB oracle helper.

Mirrors the driver's verify harness: run the Spark query and the DuckDB
oracle on the same parquet tables, compare row count, column names, and
order-insensitive values.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trail_condition_etl_spark.session import get_spark  # noqa: E402
from trail_condition_etl_spark.catalog import TABLE_NAMES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def assert_frames_match(spark_df, ddb_rows, ddb_cols):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB result."""
    s_cols = spark_df.columns
    assert sorted(s_cols) == sorted(ddb_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(ddb_cols)}"
    )
    # align column order by name (the driver sorts columns by name)
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(ddb_cols)), key=lambda i: ddb_cols[i])
    s_rows = sorted(
        tuple(_norm(r[i]) for i in order) for r in spark_df.collect()
    )
    d_rows = sorted(
        tuple(_norm(r[i]) for i in d_order) for r in ddb_rows
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i} mismatch:\n  spark : {a}\n  duckdb: {b}"
