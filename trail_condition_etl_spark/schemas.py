"""Explicit StructType schemas — the engine never infers schemas in a
production path (SURVEY.md §1.3: the reference validates every boundary
with Pydantic models; our equivalent is `spark.read.schema(...)`).

Two groups:

* TESTDATA — the driver-generated TPC-H-ish tables (TESTDATA.md).
* DOMAIN — the reference pipeline's record types, re-expressed as Spark
  StructTypes:
    - WEATHER_FACT   <- WeatherRecord (categorize-trail-conditions/src/models.py:12-18)
    - INGESTION_TASK <- OwmIngestionTask (schedule-jobs/scheduler/tasks.py:34-38)
    - CATEGORIZATION_TASK <- WeatherCategorizationTask (fetch-weather/src/tasks.py:31-41)
    - OWM_DAILY_RAW / OWM_ONECALL_RAW <- nested OpenWeatherMap payloads
      (fetch-weather/src/api.py:50-82, tests/conftest.py:40-122)
    - EXCEPTION_DETAILS / DLQ envelope (categorize-trail-conditions/src/tasks.py:48-53)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# TESTDATA tables (TESTDATA.md / FIXTURES.md §F6)
# --------------------------------------------------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

# events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet reader
# rejects; we read it as raw long nanos (spark.sql.legacy.parquet.nanosAsLong)
# and the catalog converts to a microsecond TimestampType on load.
EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Domain record types (SURVEY.md §1.1-§1.2)
# --------------------------------------------------------------------------

# WeatherRecord: categorize-trail-conditions/src/models.py:12-18
WEATHER_FACT = StructType(
    [
        StructField("city_id", IntegerType(), nullable=False),
        StructField("timestamp_utc", TimestampType(), nullable=False),
        StructField("temperature_deg_c", DoubleType(), nullable=False),
        StructField("rain_fall_total_mm", DoubleType(), nullable=False),
        # present in the ingest model (fetch-weather/src/api.py:9) but absent
        # from the window response (classifier.py:70 TODO) -> nullable
        StructField("wind_speed_mps", DoubleType(), nullable=True),
        StructField("data_source", StringType(), nullable=False),  # HISTORICAL|FORECAST
    ]
)

# OwmIngestionTask: schedule-jobs/scheduler/tasks.py:34-38
INGESTION_TASK = StructType(
    [
        StructField("task_id", StringType(), nullable=False),
        StructField("city_id", IntegerType(), nullable=False),
        StructField("latitude_deg", DoubleType(), nullable=False),
        StructField("longitude_deg", DoubleType(), nullable=False),
    ]
)

# WeatherCategorizationTask: fetch-weather/src/tasks.py:31-41 (ISO strings in
# the payload, parsed on ingest -> TimestampType here)
CATEGORIZATION_TASK = StructType(
    [
        StructField("task_id", StringType(), nullable=False),
        StructField("city_id", IntegerType(), nullable=False),
        StructField("last_historical_timestamp", TimestampType()),
        StructField("forecast_generated_at_timestamp", TimestampType()),
    ]
)

# Queued envelope metadata (fetch-weather/tests/conftest.py:239-245):
# carried as extra columns next to the payload struct.
ENVELOPE_FIELDS = [
    StructField("_message_id", StringType()),
    StructField("_enqueued_ts", TimestampType()),
    StructField("_delivery_count", IntegerType()),
]

# OWM day_summary payload (fetch-weather/src/api.py:50-63, conftest.py:40-59).
# Every branch nullable: the flatten must apply defaults (wind/precipitation
# missing -> 0.0) and route missing temperature.max to the DLQ.
OWM_DAILY_RAW = StructType(
    [
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("tz", StringType()),
        StructField("date", StringType()),
        StructField("units", StringType()),
        StructField(
            "wind",
            StructType(
                [
                    StructField(
                        "max",
                        StructType([StructField("speed", DoubleType())]),
                    ),
                    StructField("direction", IntegerType()),
                ]
            ),
        ),
        StructField(
            "precipitation", StructType([StructField("total", DoubleType())])
        ),
        StructField(
            "temperature",
            StructType(
                [
                    StructField("min", DoubleType()),
                    StructField("max", DoubleType()),
                    StructField("afternoon", DoubleType()),
                    StructField("night", DoubleType()),
                    StructField("evening", DoubleType()),
                    StructField("morning", DoubleType()),
                ]
            ),
        ),
    ]
)

# OWM onecall payload with hourly[] (fetch-weather/src/api.py:105-141,
# conftest.py:83-118). `rain` may be a struct, null, or absent — the classic
# null-dict guard (api.py:72-73) becomes coalesce() over a nullable struct.
OWM_HOURLY_ITEM = StructType(
    [
        StructField("dt", LongType()),
        StructField("temp", DoubleType()),
        StructField("wind_speed", DoubleType()),
        StructField("rain", StructType([StructField("1h", DoubleType())])),
    ]
)

OWM_ONECALL_RAW = StructType(
    [
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("timezone", StringType()),
        StructField("timezone_offset", IntegerType()),
        StructField("hourly", ArrayType(OWM_HOURLY_ITEM)),
    ]
)

# ExceptionDetails: categorize-trail-conditions/src/tasks.py:48-53
EXCEPTION_DETAILS = StructType(
    [
        StructField("exception_type", StringType()),
        StructField("message", StringType()),
        StructField("traceback", StringType()),
        StructField("safe_to_retry", BooleanType()),
    ]
)

# Trail-condition classification result (categorize sink, client.py:64-74)
TRAIL_CONDITION = StructType(
    [
        StructField("city_id", IntegerType(), nullable=False),
        StructField("classification_label", StringType(), nullable=False),
        StructField("classified_at", TimestampType()),
    ]
)

# Cities dimension (FIXTURES.md §F1 / schedule-jobs/scheduler/tasks.py:88-95)
CITIES = StructType(
    [
        StructField("city_id", IntegerType(), nullable=False),
        StructField("latitude_deg", DoubleType(), nullable=False),
        StructField("longitude_deg", DoubleType(), nullable=False),
    ]
)

# Multimodal asset table ([EXT]): opaque binary payload + typed metadata.
MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", StringType()),  # opaque bytes; BinaryType in prod
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)
