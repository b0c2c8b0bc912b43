"""Idempotent-upsert sink tests: redelivery safety (same batch twice =>
same table state), key-wise overwrite, DLQ append + redrive filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from trail_condition_etl_spark.sinks import upsert


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "city_id INT, timestamp_utc STRING, temperature_deg_c DOUBLE"
    )


def _state(spark, path):
    return sorted(
        (r.city_id, r.timestamp_utc, r.temperature_deg_c)
        for r in upsert.read_upsert_table(spark, path).collect()
    )


class TestUpsert:
    def test_create_then_idempotent_redelivery(self, spark, tmp_path):
        path = str(tmp_path / "weather")
        batch = _facts(spark, [(1, "2024-01-01", 5.0), (2, "2024-01-01", 7.0)])
        keys = ["city_id", "timestamp_utc"]
        upsert.upsert_parquet(spark, path, batch, keys)
        first = _state(spark, path)
        # redelivery of the identical batch (at-least-once) -> same state
        upsert.upsert_parquet(spark, path, batch, keys)
        assert _state(spark, path) == first
        assert len(first) == 2

    def test_update_wins_and_insert_coexists(self, spark, tmp_path):
        path = str(tmp_path / "weather")
        keys = ["city_id", "timestamp_utc"]
        upsert.upsert_parquet(
            spark, path, _facts(spark, [(1, "2024-01-01", 5.0)]), keys
        )
        upsert.upsert_parquet(
            spark,
            path,
            _facts(spark, [(1, "2024-01-01", 9.9), (3, "2024-01-02", 1.1)]),
            keys,
        )
        assert _state(spark, path) == [
            (1, "2024-01-01", 9.9),
            (3, "2024-01-02", 1.1),
        ]

    def test_untouched_keys_survive(self, spark, tmp_path):
        path = str(tmp_path / "weather")
        keys = ["city_id", "timestamp_utc"]
        upsert.upsert_parquet(
            spark,
            path,
            _facts(spark, [(i, "2024-01-01", float(i)) for i in range(20)]),
            keys,
        )
        upsert.upsert_parquet(
            spark, path, _facts(spark, [(5, "2024-01-01", -1.0)]), keys
        )
        state = dict(
            ((c, t), v) for c, t, v in _state(spark, path)
        )
        assert state[(5, "2024-01-01")] == -1.0
        assert len(state) == 20
        assert state[(7, "2024-01-01")] == 7.0

    def test_within_batch_duplicates_collapse(self, spark, tmp_path):
        path = str(tmp_path / "weather")
        keys = ["city_id", "timestamp_utc"]
        upsert.upsert_parquet(
            spark,
            path,
            _facts(spark, [(1, "2024-01-01", 5.0), (1, "2024-01-01", 5.0)]),
            keys,
        )
        assert len(_state(spark, path)) == 1


class TestDlq:
    def test_append_and_redrive_filter(self, spark, tmp_path):
        path = str(tmp_path / "dlq")
        rejects = spark.createDataFrame(
            [
                (1, "{bad", ("MalformedPayloadError", "nope", None, False)),
                (2, "{}", ("CircuitBreakerError", "open", None, True)),
            ],
            "city_id INT, raw_payload STRING, "
            "error STRUCT<exception_type STRING, message STRING, "
            "traceback STRING, safe_to_retry BOOLEAN>",
        )
        upsert.append_dlq(spark, path, rejects)
        upsert.append_dlq(spark, path, rejects)  # appends accumulate
        all_rows = spark.read.parquet(path)
        assert all_rows.count() == 4
        redrive = upsert.redrive_candidates(spark, path)
        assert redrive.count() == 2
        assert {r.error.exception_type for r in redrive.collect()} == {
            "CircuitBreakerError"
        }
