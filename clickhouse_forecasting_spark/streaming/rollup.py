"""Structured Streaming rollups over the events stream (SURVEY §7.4).

The reference is batch-only; this is the streaming-capable extension the
``events`` fixture motivates: a tumbling daily window aggregation with a
watermark for late data, producing exactly the forecast-shaped daily series
(date, event_count, total_value) the forecaster consumes. Batch and stream
share one logical definition — the same groupBy(window(...)) plan — so the
forecast pipeline can run over either without code changes.

Scale notes: windowed aggregation state is partitioned by (window, keys) and
bounded by the watermark (state for windows older than the watermark is
dropped); at 100 TB/day the shuffle carries only partial aggregates
(map-side combine), and the sink is an append-mode parquet/Delta table
partitioned by date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def daily_rollup_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-day window aggregation with late-data watermark.

    Works identically on a batch frame (window() is the same expression) —
    used that way in the oracle-checked batch query; in streaming mode the
    watermark bounds state and an append sink emits each day once final."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("date"),
            "event_count",
            "total_value",
        )
    )


def streaming_daily_events(
    spark: SparkSession, path: str, watermark: str = "1 day"
) -> DataFrame:
    """readStream over a parquet directory -> daily rollup. With
    trigger(availableNow=True) this processes the backlog and stops —
    the batch-replay entry point used in tests."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return daily_rollup_stream(stream, watermark)
