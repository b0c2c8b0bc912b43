"""Classifier rule-boundary tests (FIXTURES.md §F4) — coverage the
reference lacks entirely (SURVEY.md §5: zero classifier tests).

Pins: exact threshold semantics (>= vs > at 5.0/10.0/0.0/35.0), empty
windows, priority order of the label string, forecast[:24] positional
head, heat rule scanning the FULL forecast.
Reference: categorize-trail-conditions/src/classifier.py:20-94.
"""

from __future__ import annotations

import datetime as dt

from trail_condition_etl_spark.operators import weather

ANCHOR = dt.datetime(2024, 3, 10, 12, 0, 0)


def _weather_df(spark, rows):
    """rows: (city_id, hours_offset_from_anchor, temp, rain, source)."""
    data = [
        (
            c,
            ANCHOR + dt.timedelta(hours=h),
            float(t),
            float(r),
            0.0,
            src,
            ANCHOR,
        )
        for (c, h, t, r, src) in rows
    ]
    return spark.createDataFrame(
        data,
        "city_id INT, timestamp_utc TIMESTAMP, temperature_deg_c DOUBLE, "
        "rain_fall_total_mm DOUBLE, wind_speed_mps DOUBLE, data_source STRING, "
        "anchor_ts TIMESTAMP",
    )


def _labels(spark, rows):
    out = weather.classify_trail_conditions(_weather_df(spark, rows)).collect()
    return {r.city_id: r.labels for r in out}


def test_mud_warning_requires_rain_and_no_warm_days(spark):
    rows = [
        # city 1: 6mm rain in window, max temp 8 (no warm day) -> MUD
        (1, -10, 8.0, 6.0, "HISTORICAL"),
        (1, 2, 5.0, 0.0, "FORECAST"),
        # city 2: same rain but one warm day (>10) -> no mud, no dry
        (2, -10, 11.0, 6.0, "HISTORICAL"),
        (2, 2, 5.0, 0.0, "FORECAST"),
    ]
    labels = _labels(spark, rows)
    assert "TRAIL_MUD_WARNING" in labels[1]
    assert "TRAIL_MUD_WARNING" not in labels[2]
    assert "TRAIL_DRY_EXCELLENT" not in labels[2]


def test_rain_threshold_boundary_exactly_5mm(spark):
    # recent_rain == 5.0 hits the >= branch -> MUD (not DRY)
    rows = [
        (1, -10, 8.0, 5.0, "HISTORICAL"),
        (1, 2, 5.0, 0.0, "FORECAST"),
        # 4.999 -> DRY branch (both rains < 5)
        (2, -10, 8.0, 4.999, "HISTORICAL"),
        (2, 2, 5.0, 0.0, "FORECAST"),
    ]
    labels = _labels(spark, rows)
    assert "TRAIL_MUD_WARNING" in labels[1]
    assert "TRAIL_DRY_EXCELLENT" in labels[2]


def test_mud_window_is_two_days(spark):
    # rain 3 days ago is outside the 2-day window -> DRY
    rows = [
        (1, -72, 8.0, 50.0, "HISTORICAL"),
        (1, 2, 5.0, 0.0, "FORECAST"),
    ]
    assert "TRAIL_DRY_EXCELLENT" in _labels(spark, rows)[1]


def test_heavy_rain_cold_vs_warm(spark):
    # 12mm forecast rain in first 24 rows; avg temp < 0 -> SNOW, >= 0 -> RAIN
    rows = [
        (1, 1, -5.0, 12.0, "FORECAST"),
        (2, 1, 5.0, 12.0, "FORECAST"),
    ]
    labels = _labels(spark, rows)
    assert "HEAVY_SNOW_WARNING" in labels[1]
    assert "TRAIL_CLOSED_HEAVY_RAIN" in labels[2]


def test_heavy_rain_boundary_exactly_10mm_and_zero_avg(spark):
    # rain == 10.0 triggers (>=); avg temp == 0.0 is NOT < 0 -> RAIN label
    rows = [(1, 1, 0.0, 10.0, "FORECAST")]
    assert "TRAIL_CLOSED_HEAVY_RAIN" in _labels(spark, rows)[1]


def test_forecast_head_24_rows_positional(spark):
    # 30 forecast rows of 1mm each: only first 24 count -> 24mm >= 10
    rows = [(1, h, 5.0, 1.0, "FORECAST") for h in range(1, 31)]
    labels = _labels(spark, rows)
    assert "TRAIL_CLOSED_HEAVY_RAIN" in labels[1]
    # 30 rows of 0.4mm: head sum 9.6 < 10 -> no heavy label
    rows2 = [(2, h, 5.0, 0.4, "FORECAST") for h in range(1, 31)]
    assert "TRAIL_CLOSED_HEAVY_RAIN" not in _labels(spark, rows2)[2]


def test_snowpack_rules_and_freezing_boundaries(spark):
    rows = [
        # city 1: hist max 4 (>0), fcst min -1 (<0) -> ICY
        (1, -10, 4.0, 0.0, "HISTORICAL"),
        (1, 2, -1.0, 0.0, "FORECAST"),
        # city 2: hist max 6 (>5), fcst min 1 (>0) -> HEAVY_WET
        (2, -10, 6.0, 0.0, "HISTORICAL"),
        (2, 2, 1.0, 0.0, "FORECAST"),
        # city 3: hist max exactly 0.0 -> neither (> is strict)
        (3, -10, 0.0, 0.0, "HISTORICAL"),
        (3, 2, -1.0, 0.0, "FORECAST"),
        # city 4: hist max 4 (in (0,5]), fcst min exactly 0.0 -> neither
        (4, -10, 4.0, 0.0, "HISTORICAL"),
        (4, 2, 0.0, 0.0, "FORECAST"),
    ]
    labels = _labels(spark, rows)
    assert "SNOWPACK_ICY_CONDITIONS" in labels[1]
    assert "SNOWPACK_HEAVY_WET" in labels[2]
    assert "SNOWPACK" not in labels[3]
    assert "SNOWPACK" not in labels[4]


def test_snowpack_requires_both_windows(spark):
    rows = [(1, -10, 4.0, 0.0, "HISTORICAL")]  # no forecast rows
    assert "SNOWPACK" not in _labels(spark, rows)[1]


def test_heat_advisory_full_forecast_not_head24(spark):
    # hot row at position 26 (beyond [:24]): heat rule still fires
    # (classifier.py:74 scans full forecast_data), but min/avg use head 24
    rows = [(1, h, 20.0, 0.0, "FORECAST") for h in range(1, 26)] + [
        (1, 26, 36.0, 0.0, "FORECAST")
    ]
    assert "HEAT_ADVISORY" in _labels(spark, rows)[1]


def test_heat_boundary_exactly_35(spark):
    rows = [(1, 1, 35.0, 0.0, "FORECAST")]  # strict > -> no advisory
    labels = _labels(spark, rows)
    assert "HEAT_ADVISORY" not in labels[1]
    rows2 = [(2, 1, 35.0001, 0.0, "FORECAST")]
    assert "HEAT_ADVISORY" in _labels(spark, rows2)[2]


def test_label_priority_order_multi_rule(spark):
    # mud + heat + heavy rain together: order must be
    # mud, heat, (wind), snowpack, precipitation (classifier.py:85-90)
    rows = [
        (1, -10, 8.0, 6.0, "HISTORICAL"),
        (1, 1, 36.0, 12.0, "FORECAST"),
    ]
    labels = _labels(spark, rows)[1]
    assert labels == (
        "TRAIL_MUD_WARNING,HEAT_ADVISORY,SNOWPACK_HEAVY_WET,"
        "TRAIL_CLOSED_HEAVY_RAIN"
    )


def test_empty_forecast_dry_path(spark):
    # no forecast rows at all: rain24=0, avg default 0; dry if hist rain < 5
    rows = [(1, -10, 8.0, 1.0, "HISTORICAL")]
    labels = _labels(spark, rows)[1]
    assert "TRAIL_DRY_EXCELLENT" in labels
