"""Oracle-parity tests: for every registered query with an oracle, the
Spark result must match the DuckDB result on the same parquet tables —
the same check the driver runs at sf0.01 (here at sf0.001 for speed).
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR, assert_frames_match

import __spark_entry__ as entrymod


def _oracle_cases():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return sorted(oracles.keys() & qs.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_oracle_parity(name, spark, ddb):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    res = ddb.execute(entrymod.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    assert_frames_match(sdf, res.fetchall(), ddb_cols)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_all_queries_have_rows(spark):
    # every registered query must at least run and return a stable schema
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, f"{name} returned no columns"
