"""EP2 ingestion transform: nested OpenWeatherMap JSON -> flat typed
weather facts (SURVEY.md §3 EP2, §7 step 3).

The reference does this row-at-a-time with `.get` chains and Pydantic
validation (fetch-weather/src/api.py:41-141); here it is one declarative
plan per payload kind:

  raw json string
    -> from_json(schema, PERMISSIVE)         [P7: malformed -> null row]
    -> split valid / malformed               [S14: DLQ routing]
    -> P1/P2 flatten with coalesce defaults
    -> P3 time-range filter (forecast horizon)
    -> S4 explode(hourly[])
    -> O3 unionByName(historical, forecast)
    -> P10 categorization-task projection

Null-handling fidelity (the SURVEY §7 risk list):
* missing `temperature.max` is an ERROR (api.py:53-54) -> DLQ, not a
  default;
* missing `wind.max.speed` / `precipitation.total` default to 0.0
  (api.py:58-59);
* hourly `rain` may be a struct, null, or absent; `rain.1h` defaults to
  0.0 (the null-dict guard api.py:72-73) — `coalesce` over the nullable
  struct field handles all three shapes;
* hourly items missing `temp` are errors (tests/test_api.py:85-104) ->
  DLQ.

Scale: pure narrow maps (parse/flatten/explode) — no shuffle at all until
a downstream sink groups or merges. At 100 TB this stage is
embarrassingly parallel and IO-bound, which is exactly what you want.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import OWM_DAILY_RAW, OWM_ONECALL_RAW


def parse_daily(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """Parse day_summary JSON strings; adds a `parsed` struct column and
    `_corrupt` flag for unparseable payloads.

    from_json in PERMISSIVE mode yields an all-null struct (not a null)
    for some malformed inputs, so corruption = null struct OR every
    anchor field null."""
    return raw.withColumn(
        "parsed", F.from_json(F.col(json_col), OWM_DAILY_RAW)
    ).withColumn(
        "_corrupt",
        F.col("parsed").isNull()
        | (
            F.col("parsed.lat").isNull()
            & F.col("parsed.date").isNull()
            & F.col("parsed.temperature").isNull()
        ),
    )


def flatten_daily(parsed: DataFrame) -> DataFrame:
    """P1: day_summary -> one daily-grain WeatherData row per payload
    (api.py:50-63). Requires non-null temperature.max; defaults wind and
    precipitation to 0.0."""
    ok = parsed.filter(
        ~F.col("_corrupt") & F.col("parsed.temperature.max").isNotNull()
    )
    return ok.select(
        F.col("city_id"),
        F.to_timestamp(F.col("parsed.date")).alias("timestamp_utc"),
        F.col("parsed.temperature.max").alias("temperature_deg_c"),
        F.coalesce(F.col("parsed.precipitation.total"), F.lit(0.0)).alias(
            "rain_fall_total_mm"
        ),
        F.coalesce(F.col("parsed.wind.max.speed"), F.lit(0.0)).alias(
            "wind_speed_mps"
        ),
        F.lit("HISTORICAL").alias("data_source"),
    )


def daily_rejects(parsed: DataFrame) -> DataFrame:
    """P7/S14: rows that fail validation -> DLQ frame with an
    ExceptionDetails-shaped error struct
    (categorize-trail-conditions/src/tasks.py:48-53)."""
    bad = parsed.filter(
        F.col("_corrupt") | F.col("parsed.temperature.max").isNull()
    )
    reason = F.when(F.col("_corrupt"), "MalformedPayloadError").otherwise(
        "MissingRequiredFieldError"
    )
    detail = F.when(F.col("_corrupt"), F.lit("payload not parseable")).otherwise(
        F.lit("temperature.max is required")
    )
    return bad.select(
        "city_id",
        F.col("payload").alias("raw_payload"),
        F.struct(
            reason.alias("exception_type"),
            detail.alias("message"),
            F.lit(None).cast("string").alias("traceback"),
            F.lit(False).alias("safe_to_retry"),
        ).alias("error"),
    )


def parse_onecall(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    return raw.withColumn(
        "parsed", F.from_json(F.col(json_col), OWM_ONECALL_RAW)
    ).withColumn(
        "_corrupt",
        F.col("parsed").isNull()
        | (F.col("parsed.lat").isNull() & F.col("parsed.hourly").isNull()),
    )


def flatten_hourly(
    parsed: DataFrame,
    start: Column | str | None = None,
    duration_hours: int = 48,
) -> DataFrame:
    """P2 + P3 + S4: explode hourly[], epoch->UTC timestamp, defaults,
    and the [start, start+duration) range filter with hour-truncated
    bounds (api.py:105-141).

    `start` defaults to each payload's first hourly timestamp truncated
    to the hour (the reference passes an explicit start; both supported).
    Rows missing `temp` are excluded here and surfaced by
    `hourly_rejects`.
    """
    ex = parsed.filter(~F.col("_corrupt")).select(
        "city_id", F.explode("parsed.hourly").alias("h")
    )
    ts = F.to_timestamp(F.from_unixtime(F.col("h.dt")))
    flat = ex.select(
        "city_id",
        ts.alias("timestamp_utc"),
        F.col("h.temp").alias("temperature_deg_c"),
        # null-dict guard: rain struct null/absent OR rain.1h null -> 0.0
        F.coalesce(F.col("h.rain.1h"), F.lit(0.0)).alias("rain_fall_total_mm"),
        F.coalesce(F.col("h.wind_speed"), F.lit(0.0)).alias("wind_speed_mps"),
        F.lit("FORECAST").alias("data_source"),
    ).filter(F.col("temperature_deg_c").isNotNull())
    if start is None:
        start_col = F.min(F.date_trunc("hour", "timestamp_utc")).over(
            Window.partitionBy("city_id")
        )
    else:
        start_col = F.date_trunc(
            "hour", F.col(start) if isinstance(start, str) else start
        )
    return (
        flat.withColumn("_start", start_col)
        .withColumn("_end", F.col("_start") + F.expr(f"INTERVAL {duration_hours} HOURS"))
        .filter(
            (F.col("timestamp_utc") >= F.col("_start"))
            & (F.col("timestamp_utc") < F.col("_end"))
        )
        .drop("_start", "_end")
    )


def hourly_rejects(parsed: DataFrame) -> DataFrame:
    """Hourly items with missing temp + unparseable payloads -> DLQ."""
    corrupt = parsed.filter(F.col("_corrupt")).select(
        "city_id",
        F.col("payload").alias("raw_payload"),
        F.struct(
            F.lit("MalformedPayloadError").alias("exception_type"),
            F.lit("payload not parseable").alias("message"),
            F.lit(None).cast("string").alias("traceback"),
            F.lit(False).alias("safe_to_retry"),
        ).alias("error"),
    )
    bad_items = (
        parsed.filter(~F.col("_corrupt"))
        .select("city_id", "payload", F.explode("parsed.hourly").alias("h"))
        .filter(F.col("h.temp").isNull())
        .select(
            "city_id",
            F.col("payload").alias("raw_payload"),
            F.struct(
                F.lit("MissingRequiredFieldError").alias("exception_type"),
                F.lit("hourly.temp is required").alias("message"),
                F.lit(None).cast("string").alias("traceback"),
                F.lit(False).alias("safe_to_retry"),
            ).alias("error"),
        )
    )
    return corrupt.unionByName(bad_items)


def combine_window(historical: DataFrame, forecast: DataFrame) -> DataFrame:
    """O3: the combined hist+forecast window frame the classifier consumes
    (categorize-trail-conditions/src/client.py:37-52)."""
    return historical.unionByName(forecast)


def derive_categorization_tasks(
    ingestion_tasks: DataFrame, now: Column
) -> DataFrame:
    """P10: ingestion task + computed timestamps -> WeatherCategorizationTask
    (fetch-weather/src/tasks.py:61-62,77-82): hour-truncated "now" and
    previous date, serialized as ISO strings in the payload."""
    hour = F.date_trunc("hour", now)
    return ingestion_tasks.select(
        "task_id",
        "city_id",
        F.date_format(hour - F.expr("INTERVAL 1 DAY"), "yyyy-MM-dd").alias(
            "last_historical_timestamp"
        ),
        F.date_format(hour, "yyyy-MM-dd'T'HH:mm:ss'+00:00'").alias(
            "forecast_generated_at_timestamp"
        ),
    )
