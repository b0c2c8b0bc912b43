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


def _prop_k() -> Column:
    return F.coalesce(
        F.get_json_object("props", "$.k").cast("long"), F.lit(0)
    )


def synth_daily_raw(events: DataFrame) -> DataFrame:
    """Deterministic OWM day_summary payloads derived from the events
    table, so the P1/P7/S14 path is exercisable against a SQL oracle:

    * ``error`` events -> unparseable payload (P7 corrupt branch);
    * ``view`` events  -> missing ``temperature.max`` (required-field DLQ);
    * ``purchase``     -> precipitation present, else absent (default 0.0);
    * even ``props.k`` -> wind present, else absent (default 0.0).

    ``to_json`` drops null struct fields (ignoreNullFields), which is
    exactly the absent-key shape the reference's ``.get`` chains guard
    against (fetch-weather/src/api.py:58-59)."""
    k = _prop_k()
    body = F.to_json(
        F.struct(
            F.lit(10.0).alias("lat"),
            F.lit(20.0).alias("lon"),
            F.date_format("ts", "yyyy-MM-dd").alias("date"),
            F.when(
                F.col("event_type") != "view",
                F.struct(F.col("value").alias("max")),
            ).alias("temperature"),
            F.when(
                k % 2 == 0,
                F.struct(
                    F.struct((F.col("value") / 2).alias("speed")).alias("max")
                ),
            ).alias("wind"),
            F.when(
                F.col("event_type") == "purchase",
                F.struct((F.col("value") / 4).alias("total")),
            ).alias("precipitation"),
        )
    )
    payload = (
        F.when(F.col("event_type") == "error", F.lit("{not json"))
        .otherwise(body)
    )
    return events.select(
        F.col("user_id").alias("city_id"), payload.alias("payload")
    )


def ingest_flatten_query(events: DataFrame) -> DataFrame:
    """P1 end-to-end: synthesize raw JSON -> parse (PERMISSIVE) -> validate
    -> flatten with coalesce defaults. Narrow pipeline, no shuffle."""
    flat = flatten_daily(parse_daily(synth_daily_raw(events)))
    return flat.select(
        "city_id",
        F.date_format("timestamp_utc", "yyyy-MM-dd").alias("day"),
        "temperature_deg_c",
        "rain_fall_total_mm",
        "wind_speed_mps",
        "data_source",
    )


INGEST_FLATTEN_SQL = """
SELECT user_id AS city_id,
       strftime(ts, '%Y-%m-%d') AS day,
       value AS temperature_deg_c,
       CASE WHEN event_type = 'purchase' THEN value / 4 ELSE 0.0 END
           AS rain_fall_total_mm,
       CASE WHEN COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
                 % 2 = 0 THEN value / 2 ELSE 0.0 END AS wind_speed_mps,
       'HISTORICAL' AS data_source
FROM events
WHERE event_type NOT IN ('view', 'error')
"""


def ingest_rejects_query(events: DataFrame) -> DataFrame:
    """P7/S14 end-to-end: the DLQ split of the same synthetic payloads,
    aggregated per (city, exception_type) for a stable parity shape."""
    rej = daily_rejects(parse_daily(synth_daily_raw(events)))
    return rej.groupBy(
        "city_id", F.col("error.exception_type").alias("exception_type")
    ).agg(F.count(F.lit(1)).alias("n_rejected"))


INGEST_REJECTS_SQL = """
SELECT user_id AS city_id,
       CASE WHEN event_type = 'error' THEN 'MalformedPayloadError'
            ELSE 'MissingRequiredFieldError' END AS exception_type,
       COUNT(*) AS n_rejected
FROM events
WHERE event_type IN ('error', 'view')
GROUP BY 1, 2
"""


def synth_onecall_raw(events: DataFrame) -> DataFrame:
    """Deterministic OWM onecall payloads: one document per city whose
    ``hourly[]`` array carries that city's events (epoch seconds, temp =
    value; rain struct only for even ``props.k`` — the null-dict guard;
    wind_speed only for ``props.k % 3 == 0``; ``error`` events get a null
    temp so the required-field filter bites)."""
    k = _prop_k()
    item = F.struct(
        F.unix_timestamp("ts").alias("dt"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("temp"),
        F.when(k % 3 == 0, F.col("value") / 2).alias("wind_speed"),
        F.when(k % 2 == 0, F.struct((F.col("value") / 4).alias("1h"))).alias(
            "rain"
        ),
    )
    return events.groupBy(F.col("user_id").alias("city_id")).agg(
        F.to_json(
            F.struct(
                F.lit(10.0).alias("lat"),
                F.lit(20.0).alias("lon"),
                F.collect_list(item).alias("hourly"),
            )
        ).alias("payload")
    )


def ingest_explode_query(events: DataFrame) -> DataFrame:
    """P2+P3+S4 end-to-end: onecall JSON -> explode(hourly) -> epoch->ts,
    coalesce defaults, and the [first-hour, +48h) range filter. Epoch
    seconds in the output keep the parity timezone-free."""
    flat = flatten_hourly(parse_onecall(synth_onecall_raw(events)))
    return flat.select(
        "city_id",
        F.unix_timestamp("timestamp_utc").alias("ts_epoch_s"),
        "temperature_deg_c",
        "rain_fall_total_mm",
        "wind_speed_mps",
        "data_source",
    )


INGEST_EXPLODE_SQL = """
WITH h AS (
  SELECT user_id AS city_id,
         epoch_us(ts) // 1000000 AS es,
         CASE WHEN event_type <> 'error' THEN value END AS temp,
         CASE WHEN COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT),
                            0) % 2 = 0 THEN value / 4 ELSE 0.0 END AS rain,
         CASE WHEN COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT),
                            0) % 3 = 0 THEN value / 2 ELSE 0.0 END AS wind
  FROM events
),
v AS (SELECT * FROM h WHERE temp IS NOT NULL),
s AS (
  SELECT *, MIN(es // 3600 * 3600) OVER (PARTITION BY city_id) AS start_s
  FROM v
)
SELECT city_id,
       es AS ts_epoch_s,
       temp AS temperature_deg_c,
       rain AS rain_fall_total_mm,
       wind AS wind_speed_mps,
       'FORECAST' AS data_source
FROM s
WHERE es >= start_s AND es < start_s + 172800
"""


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

CATEGORIZATION_NOW = "1998-08-15 13:45:17"


def categorization_tasks_query(customer: DataFrame) -> DataFrame:
    """Registered-query form of P10: cities dim -> ingestion tasks ->
    categorization-task payload with the reference's ISO-8601 string
    formats (fetch-weather/src/tasks.py:61-62,77-82) at a pinned "now"
    (the runtime path takes current_timestamp(); a fixed literal keeps
    the oracle deterministic). task_id is a deterministic surrogate here
    because uuid() is rightly nondeterministic."""
    from .pipeline import make_cities, make_ingestion_tasks

    tasks = make_ingestion_tasks(make_cities(customer), with_task_id=False)
    tasks = tasks.withColumn(
        "task_id", F.concat(F.lit("ingest-"), F.col("city_id"))
    )
    out = derive_categorization_tasks(
        tasks, F.lit(CATEGORIZATION_NOW).cast("timestamp")
    )
    return out


CATEGORIZATION_TASKS_SQL = f"""
WITH cities AS (
  SELECT CAST(c_custkey AS INT) AS city_id FROM customer
),
dedup AS (SELECT DISTINCT city_id FROM cities),
h AS (SELECT date_trunc('hour', TIMESTAMP '{CATEGORIZATION_NOW}') AS hour)
SELECT 'ingest-' || city_id AS task_id,
       city_id,
       strftime(h.hour - INTERVAL 1 DAY, '%Y-%m-%d') AS last_historical_timestamp,
       strftime(h.hour, '%Y-%m-%dT%H:%M:%S+00:00') AS forecast_generated_at_timestamp
FROM dedup, h
"""
