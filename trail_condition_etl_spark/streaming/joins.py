"""Stream-stream interval join with watermarks: the attribution shape
(purchase joined to the same user's clicks in the preceding hour).

The reference never joins two live streams — its streams meet only
through the task queue (SURVEY.md §2.4) — but this is the remaining
Structured Streaming join surface a Spark-first engine must own: both
sides are unbounded, so the join buffers each side's recent rows in the
state store and the WATERMARKS bound that state. The time-range join
condition plus both watermarks lets Spark derive how long a click must
be retained (1 h window + click watermark) and when a purchase can stop
waiting for late clicks — without them, stream-stream join state grows
forever; with them it is O(window × input rate) per key range, which is
what survives at 100 TB/day.

Semantics (append mode, inner join):
    match (purchase p, click c) iff p.user = c.user
        and c.ts in [p.ts - 1 hour, p.ts]

Under Trigger.AvailableNow over a staged table the emitted match set is
exactly the batch interval join — the DuckDB oracle replays it; the
multi-batch path (clicks and purchases arriving in different
micro-batches, matched through the state store) is pinned by
tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import artifacts
from .. import catalog

WINDOW = "1 hour"
CLICK_WATERMARK = "2 hours"
PURCHASE_WATERMARK = "1 hour"

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def attribution_join(events: DataFrame) -> DataFrame:
    """events (streaming, columns per EVENTS_STREAM_SCHEMA) -> one row
    per (purchase, prior click within WINDOW) pair. Split-filter both
    sides from the same stream, watermark each, join on user + interval."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("c_user"),
        )
        .withWatermark("click_ts", CLICK_WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "user_id",
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", PURCHASE_WATERMARK)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""
            user_id = c_user
            AND click_ts BETWEEN purchase_ts - INTERVAL {WINDOW}
                             AND purchase_ts
            """
        ),
        "inner",
    ).drop("c_user")


def attribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-query form: stage events for a file-stream source, run
    the watermarked stream-stream join under Trigger.AvailableNow, read
    the sink back. Output formats timestamps as strings and the
    click->purchase lag as exact integer microseconds (cross-engine: no
    double->int cast semantics in play)."""
    events = catalog.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    root = artifacts.scratch_dir("stream_join_")
    staging = os.path.join(root, "staging")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    events.write.mode("overwrite").parquet(staging)

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(staging)
    q = (
        attribution_join(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).select(
        "user_id",
        "purchase_id",
        "click_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
            "lag_us"
        ),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


ATTRIBUTION_SQL = """
WITH e AS (
  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type,
         value
  FROM events
)
SELECT p.user_id,
  p.event_id AS purchase_id,
  c.event_id AS click_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
  round(p.value, 2) AS purchase_value
FROM e p
JOIN e c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
"""


def stream_static_enrich_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment (the other half of the streaming join
    surface): a live event stream broadcast-joined per micro-batch to a
    slowly-changing batch dimension — here each user's cohort day,
    derived once from the batch table. On a cluster this is the pattern
    for enriching a firehose with a dimension that fits in executor
    memory: the static side is re-broadcast per batch (picking up dim
    updates between batches), the stream side never shuffles, and no
    state store is involved at all — unlike the stream-stream join
    above there is nothing to watermark.

    Under Trigger.AvailableNow over the staged events the result is
    exactly the batch join — the DuckDB oracle replays it."""
    events = catalog.load_table(spark, sf_dir, "events")
    dim = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    root = artifacts.scratch_dir("stream_enrich_")
    staging = os.path.join(root, "staging")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    events.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).write.mode("overwrite").parquet(staging)
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(staging)
    )
    enriched = stream.join(F.broadcast(dim), "user_id").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        "cohort_day",
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("cohort_day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("vc") / 100.0).alias("value_sum"),
        )
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "event_type",
            "n_events",
            F.round("value_sum", 2).alias("value_sum"),
        )
    )


STREAM_STATIC_ENRICH_SQL = """
WITH events_us AS (
  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type,
         value
  FROM events
),
dim AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events_us GROUP BY user_id
)
SELECT strftime(d.cohort_day, '%Y-%m-%d') AS cohort_day, e.event_type,
       COUNT(*) AS n_events,
       round(SUM(CAST(round(e.value * 100) AS BIGINT)) / 100.0, 2)
         AS value_sum
FROM events_us e JOIN dim d USING (user_id)
GROUP BY 1, 2
"""
