"""Kafka-shaped streaming ingest (VERDICT r4 #6).

The reference is batch-only (its only source is a ClickHouse HTTP
client, forecast_script.py:82-94); this module is the extension-surface
message-bus entry point. It is deliberately split in two layers:

1. ``parse_events_payload`` — the WIRE-to-events transformation: takes
   any frame in the Kafka source's fixed wire schema (key/value binary,
   topic, partition, offset, timestamp, timestampType — the schema the
   built-in ``format("kafka")`` source emits) and parses the JSON value
   payload into the canonical events schema. Pure column expressions
   (from_json, casts) — no Python, streaming- and batch-applicable.
2. ``read_kafka_events`` — the thin production binding that plugs layer
   1 onto ``readStream.format("kafka")``. It needs the Kafka connector
   jar and a broker, neither of which exists in this container, so
   tests exercise layer 1 through a FILE-BACKED wire double
   (``events_to_wire``) replayed with availableNow — the identical
   parse/rollup plan the Kafka binding would run.

Scale notes: the wire parse is row-local (whole-stage codegen) and the
downstream rollup is the shared ``daily_rollup_stream`` plan, so a
100 TB/day topic costs exactly the windowed-aggregation state — the
source swap changes no shuffle. Malformed payloads surface as NULL
structs (from_json semantics) and are counted, not dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .rollup import EVENTS_SCHEMA

# the fixed schema the built-in kafka source emits (Spark docs; the
# double below must match it field-for-field so layer 1 is identical
# in tests and production)
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def parse_events_payload(raw: DataFrame) -> DataFrame:
    """Wire frame -> canonical events frame.

    ``value`` is a JSON-encoded event; the event's OWN ``ts`` (event
    time) is what downstream watermarks key on — the broker append
    ``timestamp`` is kept as ``broker_ts`` for ingest-lag telemetry.
    Malformed values parse to a NULL struct and keep a NULL event_id,
    so bad-payload counting is one conditional aggregate downstream.
    """
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA).alias("e"),
        F.col("timestamp").alias("broker_ts"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
    )
    return parsed.select("e.*", "broker_ts", "kafka_partition", "kafka_offset")


def read_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Production binding: readStream.format("kafka") -> parsed events.

    Requires the spark-sql-kafka connector on the classpath and a
    reachable broker — neither exists in this container, so this
    function is exercised only through its layer-1 parse (see module
    docstring). maxOffsetsPerTrigger is the backpressure dial at real
    scale; partitions map 1:1 onto source tasks.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_events_payload(raw)


def events_to_wire(events: DataFrame, topic: str = "events") -> DataFrame:
    """Batch helper: encode canonical events AS the Kafka wire schema —
    the file-backed test double. key = user_id bytes (the partition key
    a real producer would use), value = JSON payload, offset = event_id
    (monotone per producer), timestamp = event ts (a broker would stamp
    arrival; using event ts keeps the double deterministic)."""
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            ),
            # default to_json truncates to milliseconds; the fixture
            # carries microsecond event times, so serialize all 6 digits
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        )
        .cast("binary")
        .alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def stream_wire_files(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a directory of wire-schema parquet — the replay
    entry point tests use in place of a broker."""
    return spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(path)
