"""EP2 ingestion-transform tests, mirroring the reference's test_api.py
fixtures (FIXTURES.md §F2/§F3): deterministic OWM payloads — 48 hourly
rows, temp ramp 15+2i, rain {"1h": 2.5} on even hours else null — and
the malformed variants.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from trail_condition_etl_spark.operators import ingestion


def _daily_payload(temp_max=21.6, wind=4.47, precip=3.2, **drop):
    p = {
        "lat": 33.44,
        "lon": -94.04,
        "tz": "+00:00",
        "date": "2024-03-04",
        "units": "metric",
        "wind": {"max": {"speed": wind}, "direction": 225},
        "precipitation": {"total": precip},
        "temperature": {
            "min": 10.0,
            "max": temp_max,
            "afternoon": 18.0,
            "night": 12.0,
            "evening": 16.0,
            "morning": 11.0,
        },
    }
    for k in drop.get("drop", []):
        parts = k.split(".")
        d = p
        for part in parts[:-1]:
            d = d[parts[0]] if False else d[part]
        del d[parts[-1]]
    return json.dumps(p)


def _onecall_payload(n=48, t0=1_704_067_200, drop_temp_at=None):
    hourly = []
    for i in range(n):
        item = {
            "dt": t0 + i * 3600,
            "temp": 15.0 + 2.0 * i,
            "wind_speed": 4.1 - 0.2 * i,
            "rain": {"1h": 2.5} if i % 2 == 0 else None,
        }
        if drop_temp_at is not None and i == drop_temp_at:
            del item["temp"]
        hourly.append(item)
    return json.dumps(
        {
            "lat": 33.44,
            "lon": -94.04,
            "timezone": "UTC",
            "timezone_offset": 0,
            "hourly": hourly,
        }
    )


def _raw_df(spark, rows):
    return spark.createDataFrame(rows, "city_id INT, payload STRING")


class TestDailyFlatten:
    def test_complete_row(self, spark):
        df = ingestion.flatten_daily(
            ingestion.parse_daily(_raw_df(spark, [(1, _daily_payload())]))
        )
        row = df.collect()[0]
        assert row.temperature_deg_c == 21.6
        assert row.rain_fall_total_mm == 3.2
        assert row.wind_speed_mps == 4.47
        assert row.data_source == "HISTORICAL"
        assert str(row.timestamp_utc).startswith("2024-03-04")

    def test_missing_wind_defaults_zero(self, spark):
        p = json.loads(_daily_payload())
        del p["wind"]
        df = ingestion.flatten_daily(
            ingestion.parse_daily(_raw_df(spark, [(1, json.dumps(p))]))
        )
        assert df.collect()[0].wind_speed_mps == 0.0

    def test_missing_precip_defaults_zero(self, spark):
        p = json.loads(_daily_payload())
        del p["precipitation"]
        df = ingestion.flatten_daily(
            ingestion.parse_daily(_raw_df(spark, [(1, json.dumps(p))]))
        )
        assert df.collect()[0].rain_fall_total_mm == 0.0

    def test_missing_temp_max_routed_to_dlq(self, spark):
        p = json.loads(_daily_payload())
        del p["temperature"]["max"]
        parsed = ingestion.parse_daily(_raw_df(spark, [(1, json.dumps(p))]))
        assert ingestion.flatten_daily(parsed).count() == 0
        rejects = ingestion.daily_rejects(parsed).collect()
        assert len(rejects) == 1
        assert rejects[0].error.exception_type == "MissingRequiredFieldError"
        assert rejects[0].error.safe_to_retry is False

    def test_garbage_payload_routed_to_dlq(self, spark):
        parsed = ingestion.parse_daily(_raw_df(spark, [(1, "{not json")]))
        assert ingestion.flatten_daily(parsed).count() == 0
        rejects = ingestion.daily_rejects(parsed).collect()
        assert rejects[0].error.exception_type == "MalformedPayloadError"


class TestHourlyFlatten:
    def test_48_rows_with_defaults(self, spark):
        parsed = ingestion.parse_onecall(_raw_df(spark, [(7, _onecall_payload())]))
        df = ingestion.flatten_hourly(parsed).orderBy("timestamp_utc")
        rows = df.collect()
        assert len(rows) == 48
        # temp ramp and the null-dict rain guard (even hours 2.5, odd 0.0)
        assert rows[0].temperature_deg_c == 15.0
        assert rows[1].temperature_deg_c == 17.0
        assert rows[0].rain_fall_total_mm == 2.5
        assert rows[1].rain_fall_total_mm == 0.0
        assert all(r.data_source == "FORECAST" for r in rows)

    def test_duration_filter(self, spark):
        parsed = ingestion.parse_onecall(_raw_df(spark, [(7, _onecall_payload())]))
        df = ingestion.flatten_hourly(parsed, duration_hours=2)
        assert df.count() == 2

    def test_missing_temp_item_excluded_and_dlq(self, spark):
        parsed = ingestion.parse_onecall(
            _raw_df(spark, [(7, _onecall_payload(drop_temp_at=5))])
        )
        assert ingestion.flatten_hourly(parsed).count() == 47
        rejects = ingestion.hourly_rejects(parsed).collect()
        assert len(rejects) == 1
        assert rejects[0].error.message == "hourly.temp is required"


class TestCombineAndTasks:
    def test_union_window(self, spark):
        daily = ingestion.flatten_daily(
            ingestion.parse_daily(_raw_df(spark, [(1, _daily_payload())]))
        )
        hourly = ingestion.flatten_hourly(
            ingestion.parse_onecall(_raw_df(spark, [(1, _onecall_payload(n=4))]))
        )
        combined = ingestion.combine_window(daily, hourly)
        assert combined.count() == 5
        srcs = {r.data_source for r in combined.collect()}
        assert srcs == {"HISTORICAL", "FORECAST"}

    def test_categorization_task_projection(self, spark):
        tasks = spark.createDataFrame(
            [("t-1", 42)], "task_id STRING, city_id INT"
        )
        out = ingestion.derive_categorization_tasks(
            tasks, F.lit("2024-03-04 10:42:13").cast("timestamp")
        ).collect()[0]
        assert out.task_id == "t-1"
        assert out.city_id == 42
        assert out.last_historical_timestamp == "2024-03-03"
        assert out.forecast_generated_at_timestamp == "2024-03-04T10:00:00+00:00"
