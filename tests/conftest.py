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

# Size the TEST session for the tiny test SFs (sf0.001 default): at a few
# hundred rows per table, per-task launch overhead dominates every stage,
# and 32 shuffle partitions means 32 tasks per exchange for KB of data.
# 8 cores / 8 shuffle partitions cuts that fixed cost (r14, VERDICT r13
# directive 1: the driver's pytest window truncated at ~85% — measured
# numbers in OPTIMIZATION_r14.md). setdefault: an explicit driver/CI value
# always wins, and bench.py is untouched (separate process, its own env).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

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


def _arrow_type_name(t) -> str:
    """Normalized arrow type label: width-sensitive (int32 != int64 !=
    decimal128) so DuckDB's HUGEINT widening of integer SUMs is caught
    locally, the way the driver's value-hash catches it."""
    s = str(t)
    if s.endswith(" not null"):  # arrow nullability is not a width
        s = s[: -len(" not null")]
    if s == "large_string":
        return "string"
    if s.startswith("timestamp"):
        return "timestamp"
    # int width (32 vs 64) is tolerated by the driver's hash (round-1
    # cosine_topk passed with Spark int32 rk vs DuckDB int64); what fails
    # it is HUGEINT -> decimal128/float coercion, which stays distinct.
    if s in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32"):
        return "int"
    if s.startswith("large_list<") or s.startswith("list<"):
        inner = s.split("<", 1)[1].rsplit(">", 1)[0]
        if ":" in inner:
            inner = inner.split(":", 1)[1].strip()
        return f"list<{_arrow_type_name(inner)}>"
    return s


def assert_arrow_types_match(spark_df, ddb_arrow):
    """Compare physical (arrow) column types between engines by name."""
    s_fields = {f.name: _arrow_type_name(f.type) for f in spark_df.toArrow().schema}
    d_fields = {f.name: _arrow_type_name(f.type) for f in ddb_arrow.schema}
    for name in sorted(d_fields):
        assert s_fields.get(name) == d_fields[name], (
            f"column `{name}` type width mismatch: "
            f"spark={s_fields.get(name)} duckdb={d_fields[name]}"
        )


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


@pytest.fixture(autouse=True)
def _clear_spark_cache(request):
    """The documented cache-eviction seam (operators/curation.py module
    docstring): multi-branch operators persist shared intermediates
    lazily and never unpersist inline, so the TEST harness — like
    bench.py and the verify sweep — clears the SQL cache after each
    test. Without this, ~300 tests accumulate every round-frame and
    fallback persist in the shared CacheManager for the whole session."""
    yield
    if "spark" in request.fixturenames:
        from trail_condition_etl_spark.operators import artifacts

        artifacts.clear_caches(request.getfixturevalue("spark"))
