"""Broker transport seam for the task stream (S5).

The reference's transport is Redis Streams consumer groups
(fetch-weather/src/tasks.py:97-107, DESIGN.md:35): producers XADD task
envelopes, consumers XREADGROUP batches. The first thing a production
user asks of the Spark port is "point this at Kafka" — so the stream
SOURCE is a seam with three interchangeable transports, all landing in
the SAME decoded envelope frame that `pipeline.route_envelope` /
`deduped_task_stream` / the DLQ policy consume (the operator code is
transport-agnostic):

* ``files``  — parquet file-stream over a staging dir (the TESTDATA.md
  transport; what every registered query uses);
* ``kafka``  — ``readStream.format("kafka")`` with the wire frame
  decoded by `decode_task_envelope`. Requires the
  spark-sql-kafka connector on the classpath (not baked into this
  container, so the branch raises a clear error without it);
* ``wire_files`` — the TEST DOUBLE: a file-stream whose rows carry the
  EXACT Kafka wire schema (key/value binary, topic, partition, offset,
  timestamp), produced by `encode_task_envelope`. It drives the same
  `decode_task_envelope` the kafka branch uses, so the decode path —
  the only kafka-specific logic — is exercised without the connector.

At 100 TB the kafka branch is the real deployment: one partition per
shuffle-sized slice of the keyspace, `maxOffsetsPerTrigger` playing the
dequeue-batch-size role `maxFilesPerTrigger` plays for files.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: the columns a Kafka source emits per record (the connector's fixed
#: output schema), reproduced for the wire-file test double.
KAFKA_WIRE_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, offset LONG, "
    "timestamp TIMESTAMP, timestampType INT"
)


@dataclass
class BrokerConfig:
    """Where the task stream comes from. Exactly one transport."""

    kind: str  # "files" | "kafka" | "wire_files"
    path: str | None = None  # files / wire_files: staging dir
    bootstrap_servers: str | None = None  # kafka
    topic: str | None = None  # kafka
    starting_offsets: str = "earliest"  # kafka
    max_per_trigger: int | None = 10  # files-per-trigger / offsets-per-trigger
    options: dict[str, str] = field(default_factory=dict)  # extra passthrough


def kafka_reader_options(conf: BrokerConfig) -> dict[str, str]:
    """The option map the kafka branch passes to the reader — a pure
    function so tests pin the wiring without needing the connector."""
    opts = {
        "kafka.bootstrap.servers": conf.bootstrap_servers or "",
        "subscribe": conf.topic or "",
        "startingOffsets": conf.starting_offsets,
        # effectively-once end-to-end comes from checkpoint + idempotent
        # upsert, not broker redelivery guarantees — read uncommitted
        # would reintroduce the reference's ack-before-persist window
        "kafka.isolation.level": "read_committed",
    }
    if conf.max_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(conf.max_per_trigger)
    opts.update(conf.options)
    return opts


def decode_task_envelope(wire: DataFrame, schema: StructType | str) -> DataFrame:
    """Kafka wire frame -> decoded task envelope: JSON-decode ``value``
    against the declared envelope schema, carrying the broker position
    as ``_source_partition``/``_source_offset`` audit columns (the
    XREADGROUP message id of the reference). Malformed payloads decode
    to all-NULL structs, which the pipeline's validation filter (P7)
    routes to the DLQ rather than crashing the stream."""
    return wire.select(
        F.from_json(F.col("value").cast("string"), schema).alias("env"),
        F.col("partition").alias("_source_partition"),
        F.col("offset").alias("_source_offset"),
    ).select("env.*", "_source_partition", "_source_offset")


def encode_task_envelope(
    tasks: DataFrame, topic: str = "tasks", n_partitions: int = 4
) -> DataFrame:
    """Task envelope -> Kafka wire frame (the producer side / the test
    double's file payload): value = JSON bytes of the row, key = task_id
    bytes (so a real producer partition-routes by key — all redeliveries
    of one task land in one partition, preserving per-key order),
    partition/offset assigned deterministically from the key hash so the
    double is reproducible."""
    cols = tasks.columns
    part = F.pmod(F.xxhash64("task_id"), F.lit(n_partitions)).cast("int")
    return tasks.select(
        F.col("task_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*cols)).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        F.row_number()
        .over(Window.partitionBy(part).orderBy("task_id"))
        .cast("long")
        .alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


_CONNECTOR_HINT = (
    "kafka transport requires the spark-sql-kafka connector "
    "on the classpath (spark.jars.packages "
    "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
)


def _missing_connector(exc: Exception) -> bool:
    """True only for the jar-absent failure mode. Any OTHER error from
    the kafka branch (bad option, unwritable checkpoint, auth
    misconfig) must propagate as itself — remapping it to 'install the
    connector' would send the operator hunting for a jar that is
    already there."""
    msg = str(exc)
    return (
        "DATA_SOURCE_NOT_FOUND" in msg
        or "Failed to find data source" in msg
        or "ClassNotFoundException" in msg
    )


def read_broker_stream(
    spark: SparkSession, conf: BrokerConfig, schema: StructType | str
) -> DataFrame:
    """S5 through the transport seam: a streaming frame of DECODED task
    envelopes, whatever the wire. `pipeline.run_pipeline_from_stream`
    consumes the result identically for every transport."""
    if conf.kind == "files":
        reader = spark.readStream.schema(schema)
        if conf.max_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", conf.max_per_trigger)
        return reader.parquet(conf.path)
    if conf.kind == "wire_files":
        reader = spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        if conf.max_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", conf.max_per_trigger)
        wire = reader.parquet(conf.path)
        return decode_task_envelope(wire, schema).drop(
            "_source_partition", "_source_offset"
        )
    if conf.kind == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in kafka_reader_options(conf).items():
            reader = reader.option(k, v)
        try:
            wire = reader.load()
        except Exception as exc:
            if _missing_connector(exc):  # jar absent in this container
                raise RuntimeError(_CONNECTOR_HINT) from exc
            raise
        return decode_task_envelope(wire, schema).drop(
            "_source_partition", "_source_offset"
        )
    raise ValueError(f"unknown broker transport: {conf.kind!r}")


def kafka_writer_options(conf: BrokerConfig) -> dict[str, str]:
    """Option map for the kafka SINK branch (pure function, pinned by
    tests without the connector)."""
    opts = {
        "kafka.bootstrap.servers": conf.bootstrap_servers or "",
        "topic": conf.topic or "",
        # idempotent producer: broker-side dedup of producer retries —
        # the transport half of the effectively-once story (the
        # checkpoint + idempotent upsert is the processing half)
        "kafka.enable.idempotence": "true",
        "kafka.acks": "all",
    }
    opts.update(conf.options)
    return opts


def _offsets_sidecar(checkpoint: str) -> str:
    return os.path.join(checkpoint, "wire_offsets.json")


def _read_offsets_sidecar(checkpoint: str) -> dict | None:
    try:
        with open(_offsets_sidecar(checkpoint)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None  # first epoch of this stream: no state yet
    # corrupt sidecar (ValueError) or IO failure propagates: silently
    # restarting offsets at 1 would violate the (partition, offset)
    # uniqueness invariant this state exists to guarantee (ADVICE r5)


def _emit_wire_batch(
    batch: DataFrame, epoch_id: int, conf: BrokerConfig, checkpoint: str
) -> None:
    """The wire_files sink's per-epoch write. Offsets must stay MONOTONE
    per partition ACROSS epochs (Kafka's invariant): encode_task_envelope's
    row_number restarts at 1 every micro-batch, so each epoch rebases on
    the per-partition high-water mark — persisted in a tiny sidecar under
    the CHECKPOINT dir (VERDICT r5 directive 6: the previous
    implementation rescanned the whole accumulated wire dir every epoch,
    O(history) for a long-running stream). The one remaining full scan is
    the bootstrap of a wire dir written before any sidecar existed.

    Epoch-retry determinism (ADVICE r5): the sidecar records the BASE the
    current epoch was rebased on; a retried epoch (same epoch_id, or a
    crash before the sidecar advanced) reuses that same base, so replayed
    rows carry IDENTICAL (partition, offset) pairs — duplicates are
    dedupable by position, never disguised as fresh gap-free offsets.
    The sidecar lands AFTER the data append (atomic temp + os.replace),
    ordering both crash windows into the reuse-the-base path."""
    enc = encode_task_envelope(batch, topic=conf.topic or "tasks")
    spark = batch.sparkSession
    state = _read_offsets_sidecar(checkpoint)
    if state is not None and int(state.get("epoch", -1)) == int(epoch_id):
        base = {int(p): int(o) for p, o in state["base"].items()}
    elif state is not None:
        base = {int(p): int(o) for p, o in state["high"].items()}
    elif os.path.isdir(conf.path):
        # bootstrap over a pre-sidecar wire dir: scan ONCE; any read
        # failure is a real error and propagates (no blind reset to 1)
        base = {
            r.partition: r.m
            for r in spark.read.schema(KAFKA_WIRE_SCHEMA)
            .parquet(conf.path)
            .groupBy("partition")
            .agg(F.max("offset").alias("m"))
            .collect()
        }
    else:
        base = {}
    if base:
        base_df = spark.createDataFrame(
            [(p, o) for p, o in base.items()],
            "partition int, _base_offset long",
        )
        enc = (
            enc.join(F.broadcast(base_df), "partition", "left")
            .withColumn(
                "offset",
                F.col("offset") + F.coalesce(F.col("_base_offset"), F.lit(0)),
            )
            .drop("_base_offset")
        )
    out = enc.select(
        "key", "value", "topic", "partition", "offset",
        "timestamp", "timestampType",
    ).persist()
    try:
        out.write.mode("append").parquet(conf.path)
        high = dict(base)
        for r in (
            out.groupBy("partition").agg(F.max("offset").alias("m")).collect()
        ):
            high[int(r.partition)] = int(r.m)
    finally:
        out.unpersist()
    sidecar = _offsets_sidecar(checkpoint)
    os.makedirs(checkpoint, exist_ok=True)
    tmp = f"{sidecar}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(
            {
                "epoch": int(epoch_id),
                "base": {str(p): o for p, o in base.items()},
                "high": {str(p): o for p, o in high.items()},
            },
            f,
        )
    os.replace(tmp, sidecar)


def write_broker_stream(
    stream: DataFrame,
    conf: BrokerConfig,
    checkpoint: str,
    available_now: bool = True,
):
    """S6 through the transport seam: publish a streaming envelope frame
    back to a broker (the reference's producer XADD half). ``kafka``
    serializes key=task_id / value=JSON(row) through the connector;
    ``wire_files`` is the test double — the SAME key/value encoding
    written as parquet wire rows via foreachBatch (offset assignment is
    a per-batch window, legal inside foreachBatch where the batch is a
    static frame); ``files`` appends the decoded frame as plain parquet.
    """
    cols = stream.columns
    if conf.kind == "kafka":
        out = stream.select(
            F.col("task_id").cast("string").cast("binary").alias("key"),
            F.to_json(F.struct(*cols)).cast("binary").alias("value"),
        )
        writer = out.writeStream.format("kafka")
        for k, v in kafka_writer_options(conf).items():
            writer = writer.option(k, v)
        writer = writer.option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        try:
            return writer.start()
        except Exception as exc:
            if _missing_connector(exc):  # jar absent in this container
                raise RuntimeError(_CONNECTOR_HINT) from exc
            raise
    if conf.kind == "wire_files":

        def emit(batch: DataFrame, epoch_id: int) -> None:
            _emit_wire_batch(batch, epoch_id, conf, checkpoint)

        writer = stream.writeStream.foreachBatch(emit).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
    if conf.kind == "files":
        writer = (
            stream.writeStream.format("parquet")
            .option("path", conf.path)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
    raise ValueError(f"unknown broker transport: {conf.kind!r}")
