"""Weather fact derivation + rule-based trail-condition classifier.

The reference's core business logic is `RuleBasedTrailConditionClassifier`
(categorize-trail-conditions/src/classifier.py:20-94): per city, compute
time-windowed aggregates over a historical window and a forecast window,
then apply five priority-ordered threshold rules producing labels.

The reference runs this row-at-a-time in Python, five separate passes over
per-city lists. Here it is ONE distributed plan:

    weather facts
      -> row_number over (city_id, data_source) ordered by ts   [P9: forecast[:24]]
      -> single groupBy(city_id) with conditional aggregates    [A1-A6, one shuffle]
      -> CASE-expression rules                                  [§2.7, priority order]
      -> concat_ws labels                                       [A8 + tasks.py:76]

Scale notes: the only wide operations are one window sort (partitioned by
city+source — bounded per-city state) and one hash aggregation with
map-side partial aggregation. No Python UDFs; everything stays in
WholeStageCodegen. At 100 TB the plan is shuffle-minimal: a single
exchange on city_id (the window and the groupBy share the city_id
clustering, and AQE coalesces the post-shuffle partitions).

Determinism: `check_all_weather_for_mud` uses `datetime.now()`
(classifier.py:29) — here "now" is a parameter (`anchor_ts`), derived from
the data (max event time minus the forecast horizon) so batch replays are
reproducible (SURVEY.md §7 risk list).

Numeric parity with the DuckDB oracle: windowed SUMs are computed on
integer-scaled values (round(x*1e6) as BIGINT) so the result is exact and
independent of accumulation order, then de-scaled once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Thresholds: classifier.py:21-26
RAIN_THRESHOLD_MM = 5.0
HEAVY_RAIN_THRESHOLD_MM = 10.0
MUD_DAYS = 2
FREEZING_POINT_C = 0.0
HEAT_ADVISORY_C = 35.0
WIND_ADVISORY_MPS = 15.0
FORECAST_HEAD_ROWS = 24  # classifier.py:30 `forecast_data[:24]`

SCALE = 1_000_000  # integer-scaling factor for order-independent sums


def derive_weather_from_events(events: DataFrame, n_cities: int = 10) -> DataFrame:
    """Deterministically derive a weather-fact frame from the driver's
    `events` table (event_id, ts, user_id, event_type, value, props).

    This stands in for the reference's ingested weather store
    (WEATHER_FACT schema) so the classifier is oracle-checkable on
    driver-provided data. The anchor ("now") is max(ts) truncated to the
    hour minus 24h: rows at/after the anchor play the FORECAST role, rows
    before it are HISTORICAL — mirroring the hist-window/forecast-window
    split of categorize-trail-conditions/src/client.py:48-52.

    Every derivation is a per-row IEEE double op (fmod/sub) that evaluates
    bit-identically in Spark and DuckDB.

    The scalar "now" is a bounded 1-row driver collect (epoch seconds of
    max(ts), hour-truncated) folded back in as a literal — the r2 form
    cross-joined a 1-row aggregate subplan, which put a SECOND full
    FileScan of the fact into every consumer's plan. The anchor job reads
    only the pruned `ts` column; the main plan then scans the fact once.
    """
    # bounded collect: one row, one long (sanctioned like the streaming
    # anchor at streaming/pipeline.py) — epoch seconds sidestep the
    # driver-local-timezone conversion of collected timestamps
    anchor_epoch = events.agg(
        (
            F.unix_timestamp(F.date_trunc("hour", F.max("ts"))) - 24 * 3600
        ).alias("e")
    ).first()["e"]
    return (
        events.withColumn(
            "anchor_ts", F.timestamp_seconds(F.lit(anchor_epoch))
        )
        .select(
            (F.col("user_id") % n_cities).cast("int").alias("city_id"),
            F.col("ts").alias("timestamp_utc"),
            (F.col("value") % 45.0 - 5.0).alias("temperature_deg_c"),
            F.when(F.col("event_id") % 3 == 0, F.col("value") % 12.0)
            .otherwise(F.lit(0.0))
            .alias("rain_fall_total_mm"),
            (F.col("value") % 20.0).alias("wind_speed_mps"),
            F.when(F.col("ts") >= F.col("anchor_ts"), F.lit("FORECAST"))
            .otherwise(F.lit("HISTORICAL"))
            .alias("data_source"),
            F.col("anchor_ts"),
        )
    )


def _scaled_sum(cond: Column, value: Column) -> Column:
    """Order-independent conditional SUM: scale to int64, sum exactly."""
    scaled = F.round(value * SCALE).cast("long")
    return F.coalesce(
        F.sum(F.when(cond, scaled).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
    )


def classify_trail_conditions(weather: DataFrame) -> DataFrame:
    """Apply the five rules of classifier.py:28-94 as one Spark plan.

    Input: WEATHER_FACT-shaped frame plus an `anchor_ts` column (the
    deterministic "now"). Output: one row per city_id with the windowed
    features and the comma-joined label string
    (`",".join(labels)` — categorize-trail-conditions/src/tasks.py:76).

    Semantics preserved exactly:
    * `forecast_data[:24]` is positional (classifier.py:30) -> row_number
      over ts within (city, FORECAST), rn <= 24.
    * mud window = now - 2 days over HISTORICAL rows (classifier.py:31-38);
      empty window -> recent_rain 0.0, recent_warm false.
    * forecast_temp_avg over the first-24 rows, 0 when empty
      (classifier.py:49-53).
    * heat advisory scans the FULL forecast, not [:24] (classifier.py:74).
    * snowpack rules require both windows non-empty (classifier.py:60).
    * rule priority order: mud, heat, wind (always null — classifier.py:71
      TODO), snowpack, precipitation (classifier.py:85-90).
    """
    w = Window.partitionBy("city_id", "data_source").orderBy(
        "timestamp_utc", "rain_fall_total_mm"
    )
    is_fcst = F.col("data_source") == "FORECAST"
    is_hist = F.col("data_source") == "HISTORICAL"
    # ONE exchange end to end (guide §2.4): hash-partition by city_id up
    # front — hash(city_id) satisfies the window's (city_id, data_source)
    # clustered distribution (a subset of the clustering keys), and the
    # final groupBy("city_id") reuses the same partitioning, where the
    # default plan paid Exchange(city, source) for the window and a
    # SECOND Exchange(city) for the aggregate. Projecting to the five
    # columns the rules read drops wind_speed_mps (computed upstream,
    # never used — reference classifier.py:69-71 wind rule is a TODO)
    # before the rows shuffle. Skew trade-off (ADVICE r13): keying the
    # exchange on city_id alone caps parallelism at city cardinality —
    # fine here (cities ≈ uniform hash of user_id) and measured faster,
    # but on a real low-cardinality or hot-city feed the previous
    # (city_id, data_source) partitioning spread the same rows over
    # twice the keys; salt the key before reusing this shape there.
    rows = weather.select(
        "city_id",
        "timestamp_utc",
        "temperature_deg_c",
        "rain_fall_total_mm",
        "data_source",
        "anchor_ts",
    ).repartition("city_id").withColumn("rn", F.row_number().over(w))

    in_head24 = is_fcst & (F.col("rn") <= FORECAST_HEAD_ROWS)
    mud_start = F.col("anchor_ts") - F.expr(f"INTERVAL {MUD_DAYS} DAYS")
    in_mud_window = is_hist & (F.col("timestamp_utc") >= mud_start)

    temp = F.col("temperature_deg_c")
    rain = F.col("rain_fall_total_mm")

    agg = rows.groupBy("city_id").agg(
        # A1: rain over forecast[:24]
        (_scaled_sum(in_head24, rain) / SCALE).alias("rain_sum_24h_forecast"),
        # A2: rain over trailing-2d historical
        (_scaled_sum(in_mud_window, rain) / SCALE).alias("recent_rain_mm"),
        # A3: any warm day in the mud window
        F.coalesce(
            F.max(F.when(in_mud_window & (temp > 10.0), True)), F.lit(False)
        ).alias("recent_warm_days"),
        # A4: avg temp over forecast[:24] (exact: scaled-int sum / count)
        _scaled_sum(in_head24, temp).alias("_head24_temp_scaled"),
        F.count(F.when(in_head24, F.lit(1))).alias("_head24_n"),
        # A5: max temps
        F.max(F.when(is_hist, temp)).alias("historical_max_temp"),
        F.max(F.when(is_fcst, temp)).alias("max_temp_forecast"),
        # A6: min temp over forecast[:24]
        F.min(F.when(in_head24, temp)).alias("forecast_min_temp"),
        F.count(F.when(is_hist, F.lit(1))).alias("_hist_n"),
        F.count(F.when(is_fcst, F.lit(1))).alias("_fcst_n"),
    )

    feats = agg.withColumn(
        "forecast_temp_avg",
        F.when(
            F.col("_head24_n") > 0,
            F.col("_head24_temp_scaled") / SCALE / F.col("_head24_n"),
        ).otherwise(F.lit(0.0)),
    )

    # --- rules (classifier.py:28-77), each a CASE expression -------------
    mud_rule = (
        F.when(
            (F.col("recent_rain_mm") >= RAIN_THRESHOLD_MM)
            & (~F.col("recent_warm_days")),
            "TRAIL_MUD_WARNING",
        )
        .when(
            (F.col("recent_rain_mm") < RAIN_THRESHOLD_MM)
            & (F.col("rain_sum_24h_forecast") < RAIN_THRESHOLD_MM),
            "TRAIL_DRY_EXCELLENT",
        )
        .otherwise(F.lit(None).cast("string"))
    )
    heat_rule = F.when(
        F.col("max_temp_forecast") > HEAT_ADVISORY_C, "HEAT_ADVISORY"
    ).otherwise(F.lit(None).cast("string"))
    # wind rule: always null (classifier.py:69-71 TODO in the reference)
    snowpack_rule = F.when(
        (F.col("_hist_n") > 0) & (F.col("_fcst_n") > 0),
        F.when(
            (F.col("historical_max_temp") > FREEZING_POINT_C)
            & (F.col("forecast_min_temp") < FREEZING_POINT_C),
            "SNOWPACK_ICY_CONDITIONS",
        ).when(
            (F.col("historical_max_temp") > 5.0)
            & (F.col("forecast_min_temp") > FREEZING_POINT_C),
            "SNOWPACK_HEAVY_WET",
        ),
    ).otherwise(F.lit(None).cast("string"))
    precip_rule = F.when(
        F.col("rain_sum_24h_forecast") >= HEAVY_RAIN_THRESHOLD_MM,
        F.when(
            F.col("forecast_temp_avg") < FREEZING_POINT_C, "HEAVY_SNOW_WARNING"
        ).otherwise("TRAIL_CLOSED_HEAVY_RAIN"),
    ).otherwise(F.lit(None).cast("string"))

    return feats.select(
        "city_id",
        F.round("recent_rain_mm", 4).alias("recent_rain_mm"),
        F.round("rain_sum_24h_forecast", 4).alias("rain_sum_24h_forecast"),
        F.col("recent_warm_days"),
        F.round("forecast_temp_avg", 4).alias("forecast_temp_avg"),
        F.round("historical_max_temp", 4).alias("historical_max_temp"),
        F.round("forecast_min_temp", 4).alias("forecast_min_temp"),
        F.round("max_temp_forecast", 4).alias("max_temp_forecast"),
        # A8: priority-ordered label collection; concat_ws skips nulls,
        # matching the append-if-not-None loop (classifier.py:84-94) +
        # ",".join (tasks.py:76). Wind rule omitted: always None.
        F.concat_ws(",", mud_rule, heat_rule, snowpack_rule, precip_rule).alias(
            "labels"
        ),
    )


def classify_events(events: DataFrame, n_cities: int = 10) -> DataFrame:
    """End-to-end flagship: events -> derived weather -> classification."""
    return classify_trail_conditions(derive_weather_from_events(events, n_cities))


# ---------------------------------------------------------------------------
# DuckDB-oracle SQL for the same pipeline (kept adjacent so the two stay in
# lock-step; __spark_entry__.oracle_sql() re-exports it).
# ---------------------------------------------------------------------------

WEATHER_CTE = """
events_us AS (
  -- truncate ns-precision ts to the µs grain of Spark's TimestampType
  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type,
         value, props
  FROM events
),
anchor AS (
  SELECT date_trunc('hour', max(ts)) - INTERVAL 24 HOUR AS anchor_ts
  FROM events_us
),
weather AS (
  SELECT
    CAST(user_id % 10 AS INT)                         AS city_id,
    ts                                                AS timestamp_utc,
    (value % CAST(45.0 AS DOUBLE)) - 5.0              AS temperature_deg_c,
    CASE WHEN event_id % 3 = 0
         THEN value % CAST(12.0 AS DOUBLE) ELSE 0.0 END AS rain_fall_total_mm,
    value % CAST(20.0 AS DOUBLE)                      AS wind_speed_mps,
    CASE WHEN ts >= anchor_ts THEN 'FORECAST'
         ELSE 'HISTORICAL' END                        AS data_source,
    anchor_ts
  FROM events_us, anchor
)
"""

CLASSIFY_SQL = f"""
WITH {WEATHER_CTE},
ranked AS (
  SELECT *,
    row_number() OVER (
      PARTITION BY city_id, data_source
      ORDER BY timestamp_utc, rain_fall_total_mm
    ) AS rn
  FROM weather
),
agg AS (
  SELECT
    city_id,
    COALESCE(SUM(CASE WHEN data_source = 'FORECAST' AND rn <= 24
        THEN CAST(round(rain_fall_total_mm * 1000000) AS BIGINT) ELSE 0 END), 0)
        / 1000000.0 AS rain_sum_24h_forecast,
    COALESCE(SUM(CASE WHEN data_source = 'HISTORICAL'
        AND timestamp_utc >= anchor_ts - INTERVAL 2 DAY
        THEN CAST(round(rain_fall_total_mm * 1000000) AS BIGINT) ELSE 0 END), 0)
        / 1000000.0 AS recent_rain_mm,
    COALESCE(MAX(CASE WHEN data_source = 'HISTORICAL'
        AND timestamp_utc >= anchor_ts - INTERVAL 2 DAY
        AND temperature_deg_c > 10.0 THEN TRUE END), FALSE) AS recent_warm_days,
    COALESCE(SUM(CASE WHEN data_source = 'FORECAST' AND rn <= 24
        THEN CAST(round(temperature_deg_c * 1000000) AS BIGINT) ELSE 0 END), 0)
        AS _head24_temp_scaled,
    COUNT(CASE WHEN data_source = 'FORECAST' AND rn <= 24 THEN 1 END) AS _head24_n,
    MAX(CASE WHEN data_source = 'HISTORICAL' THEN temperature_deg_c END)
        AS historical_max_temp,
    MAX(CASE WHEN data_source = 'FORECAST' THEN temperature_deg_c END)
        AS max_temp_forecast,
    MIN(CASE WHEN data_source = 'FORECAST' AND rn <= 24
        THEN temperature_deg_c END) AS forecast_min_temp,
    COUNT(CASE WHEN data_source = 'HISTORICAL' THEN 1 END) AS _hist_n,
    COUNT(CASE WHEN data_source = 'FORECAST' THEN 1 END) AS _fcst_n
  FROM ranked
  GROUP BY city_id
),
feats AS (
  SELECT *,
    CASE WHEN _head24_n > 0
         THEN _head24_temp_scaled / 1000000.0 / _head24_n
         ELSE 0.0 END AS forecast_temp_avg
  FROM agg
),
rules AS (
  SELECT *,
    CASE WHEN recent_rain_mm >= 5.0 AND NOT recent_warm_days
           THEN 'TRAIL_MUD_WARNING'
         WHEN recent_rain_mm < 5.0 AND rain_sum_24h_forecast < 5.0
           THEN 'TRAIL_DRY_EXCELLENT' END AS mud_rule,
    CASE WHEN max_temp_forecast > 35.0 THEN 'HEAT_ADVISORY' END AS heat_rule,
    CASE WHEN _hist_n > 0 AND _fcst_n > 0 THEN
      CASE WHEN historical_max_temp > 0.0 AND forecast_min_temp < 0.0
             THEN 'SNOWPACK_ICY_CONDITIONS'
           WHEN historical_max_temp > 5.0 AND forecast_min_temp > 0.0
             THEN 'SNOWPACK_HEAVY_WET' END END AS snowpack_rule,
    CASE WHEN rain_sum_24h_forecast >= 10.0 THEN
      CASE WHEN forecast_temp_avg < 0.0 THEN 'HEAVY_SNOW_WARNING'
           ELSE 'TRAIL_CLOSED_HEAVY_RAIN' END END AS precip_rule
  FROM feats
)
SELECT
  city_id,
  round(recent_rain_mm, 4)        AS recent_rain_mm,
  round(rain_sum_24h_forecast, 4) AS rain_sum_24h_forecast,
  recent_warm_days,
  round(forecast_temp_avg, 4)     AS forecast_temp_avg,
  round(historical_max_temp, 4)   AS historical_max_temp,
  round(forecast_min_temp, 4)     AS forecast_min_temp,
  round(max_temp_forecast, 4)     AS max_temp_forecast,
  concat_ws(',', mud_rule, heat_rule, snowpack_rule, precip_rule) AS labels
FROM rules
"""


def window_readback(events: DataFrame, n_cities: int = 10) -> DataFrame:
    """J1+J3 in explicit join form: a categorization-task stream (one task
    per city) equi-joined to the weather facts with interval predicates —
    historical side restricted to the trailing 2-day window, forecast side
    to the next 24 h BY EVENT TIME (the range-join reading of
    `forecast[:24]`; the positional reading lives in the classifier).

    Mirrors categorize-trail-conditions/src/tasks.py:66-73 +
    client.py:31-56: the per-task HTTP window fetch becomes one join.
    Catalyst plans it as an equi-join on city_id with the range bounds as
    residual filters; the task side is tiny -> broadcast.
    """
    weather = derive_weather_from_events(events, n_cities)
    tasks = (
        weather.select("city_id", "anchor_ts")
        .distinct()
        .select(
            "city_id",
            "anchor_ts",
            F.concat(F.lit("task-"), F.col("city_id")).alias("task_id"),
        )
    )
    w = weather.select(
        F.col("city_id").alias("w_city_id"),
        "timestamp_utc",
        "temperature_deg_c",
        "rain_fall_total_mm",
        "data_source",
    )
    joined = F.broadcast(tasks).join(w, F.col("city_id") == F.col("w_city_id"))
    hist_start = F.col("anchor_ts") - F.expr("INTERVAL 2 DAYS")
    fcst_end = F.col("anchor_ts") + F.expr("INTERVAL 24 HOURS")
    in_hist = (
        (F.col("data_source") == "HISTORICAL")
        & (F.col("timestamp_utc") >= hist_start)
    )
    in_fcst = (
        (F.col("data_source") == "FORECAST")
        & (F.col("timestamp_utc") < fcst_end)
    )
    return (
        joined.filter(in_hist | in_fcst)
        .groupBy("task_id", "city_id")
        .agg(
            F.count(F.when(F.col("data_source") == "HISTORICAL", 1)).alias(
                "n_hist_2d"
            ),
            F.count(F.when(F.col("data_source") == "FORECAST", 1)).alias(
                "n_fcst_24h"
            ),
            F.date_format(F.min("timestamp_utc"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.date_format(F.max("timestamp_utc"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_end"
            ),
            (_scaled_sum(F.col("data_source") == "FORECAST",
                         F.col("rain_fall_total_mm")) / SCALE).alias("_r"),
        )
        .select(
            "task_id",
            "city_id",
            "n_hist_2d",
            "n_fcst_24h",
            "window_start",
            "window_end",
            F.round("_r", 4).alias("fcst_rain_24h_mm"),
        )
    )


WINDOW_READBACK_SQL = f"""
WITH {WEATHER_CTE},
tasks AS (
  SELECT DISTINCT city_id, anchor_ts, 'task-' || city_id AS task_id
  FROM weather
),
joined AS (
  SELECT t.task_id, t.city_id, t.anchor_ts, w.timestamp_utc,
         w.rain_fall_total_mm, w.data_source
  FROM tasks t JOIN weather w ON w.city_id = t.city_id
  WHERE (w.data_source = 'HISTORICAL'
         AND w.timestamp_utc >= t.anchor_ts - INTERVAL 2 DAY)
     OR (w.data_source = 'FORECAST'
         AND w.timestamp_utc < t.anchor_ts + INTERVAL 24 HOUR)
)
SELECT task_id, city_id,
  COUNT(CASE WHEN data_source = 'HISTORICAL' THEN 1 END) AS n_hist_2d,
  COUNT(CASE WHEN data_source = 'FORECAST' THEN 1 END) AS n_fcst_24h,
  strftime(MIN(timestamp_utc), '%Y-%m-%d %H:%M:%S') AS window_start,
  strftime(MAX(timestamp_utc), '%Y-%m-%d %H:%M:%S') AS window_end,
  round(COALESCE(SUM(CASE WHEN data_source = 'FORECAST'
      THEN CAST(round(rain_fall_total_mm * 1000000) AS BIGINT) ELSE 0 END), 0)
      / 1000000.0, 4) AS fcst_rain_24h_mm
FROM joined
GROUP BY task_id, city_id
"""
