"""File-source tests: schema-enforced JSONL/CSV reads split malformed
lines to rejects with the original bytes preserved (P7/S14 at the source
boundary); the happy-path roundtrip parity is tests/test_parity.py's
`jsonl_roundtrip`."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from trail_condition_etl_spark.sources import files

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_jsonl_splits_corrupt_lines_and_keeps_bytes(spark, tmp_path):
    path = tmp_path / "in.jsonl"
    path.write_text(
        '{"id": 1, "name": "a", "score": 0.5}\n'
        "not json at all\n"
        '{"id": 2, "name": "b", "score": 1.5}\n'
        '{"id": "oops-string", "name": "c", "score": 2.5}\n'
    )
    good, rejects = files.read_jsonl(spark, str(path), SCHEMA)
    assert {(r.id, r.name, r.score) for r in good.collect()} == {
        (1, "a", 0.5),
        (2, "b", 1.5),
    }
    bad = sorted(r._corrupt_record for r in rejects.collect())
    assert bad == [
        "not json at all",
        '{"id": "oops-string", "name": "c", "score": 2.5}',
    ]


def test_jsonl_missing_fields_are_nulls_not_rejects(spark, tmp_path):
    # a VALID object missing declared fields is a sparse row, not a
    # reject — schema enforcement types it, null-handling is downstream
    path = tmp_path / "in.jsonl"
    path.write_text('{"id": 3}\n')
    good, rejects = files.read_jsonl(spark, str(path), SCHEMA)
    rows = good.collect()
    assert rejects.count() == 0
    assert len(rows) == 1 and rows[0].id == 3 and rows[0].name is None


def test_csv_type_mismatch_routes_to_rejects(spark, tmp_path):
    path = tmp_path / "in.csv"
    path.write_text(
        "id,name,score\n"
        "1,a,0.5\n"
        "banana,b,1.5\n"
        "3,c,2.5\n"
    )
    good, rejects = files.read_csv(spark, str(path), SCHEMA)
    assert {r.id for r in good.collect()} == {1, 3}
    bad = [r._corrupt_record for r in rejects.collect()]
    assert bad == ["banana,b,1.5"]
