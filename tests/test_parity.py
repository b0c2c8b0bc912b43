"""Oracle-parity tests: for every registered query with an oracle, the
Spark result must match the DuckDB result on the same parquet tables —
the same check the driver runs at sf0.01 (here at sf0.001 for speed).
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR, assert_arrow_types_match, assert_frames_match

import __spark_entry__ as entrymod


def _oracle_cases():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return sorted(oracles.keys() & qs.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_oracle_parity(name, spark, ddb):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    d_arrow = ddb.execute(entrymod.oracle_sql()[name]).arrow()
    # physical type widths must match (DuckDB HUGEINT-widening of integer
    # SUMs fails the driver's value-hash even when values are identical)
    assert_arrow_types_match(sdf, d_arrow)
    ddb_cols = d_arrow.schema.names
    ddb_rows = [tuple(d.values()) for d in d_arrow.to_pylist()]
    assert_frames_match(sdf, ddb_rows, ddb_cols)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


# (the every-query flat-schema/rows sweep now runs inside
# tests/test_plans.py::test_global_invariants_every_query_one_pass —
# one registry pass carries all global invariants instead of three,
# saving ~2/3 of the most expensive block of the driver's pytest window)
