"""Incremental materialized-view maintenance for additive rollups.

The reference recomputes every forecast table from a full scan on every
run (`forecast_script.py:127-158` drop/recreate + full SELECT). The
engine-grade alternative: maintain the daily rollup as a materialized
aggregate that a DELTA of new events updates in place.

Scale contract:
- the delta is aggregated first (shuffle carries one row per touched day),
- only partitions for TOUCHED days are read back from the existing view
  (partition pruning on the date directory),
- merge is additive (count/sum partials add; avg derives from sum/count),
- the write rewrites only touched partitions (dynamic partition
  overwrite via sources.upsert_partitioned).

Cost therefore tracks the delta and the days it touches — never the size
of the accumulated view. This is the same mergeable-partial idea the
sketch rollups use, applied to plain additive aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def delta_daily_rollup(events_delta: DataFrame) -> DataFrame:
    """Aggregate a batch of new events to the view's grain."""
    return (
        events_delta.withColumn("date", F.to_date("ts"))
        .groupBy("date")
        .agg(
            F.count("*").alias("event_count"),
            F.sum("value").alias("total_value"),
        )
    )


def merge_additive(existing: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial-aggregate frames with identical schemas: rows
    align on `keys`; every other column adds (missing side = 0)."""
    value_cols = [c for c in existing.columns if c not in keys]
    unioned = existing.select(*keys, *value_cols).unionByName(
        delta.select(*keys, *value_cols)
    )
    return unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in value_cols]
    )


def maintain_daily_rollup(
    spark: SparkSession, events_delta: DataFrame, view_path: str
) -> None:
    """Apply a delta of events to the materialized daily rollup at
    `view_path` (date-partitioned parquet). Creates the view on first use;
    afterwards reads ONLY the touched date partitions, merges additively,
    and dynamically overwrites only those partitions. An empty delta is a
    no-op (a scheduled run with no new events must not create or touch
    anything)."""
    from ..sources.formats import path_exists

    delta = delta_daily_rollup(events_delta)
    if delta.isEmpty():
        return

    if not path_exists(spark, view_path):
        delta.write.partitionBy("date").parquet(view_path)
        return

    touched = [r.date for r in delta.select("date").distinct().collect()]
    existing = spark.read.parquet(view_path).filter(F.col("date").isin(touched))
    # merged fully covers every touched partition, so it can overwrite
    # those partitions directly (no anti-join against the target needed);
    # localCheckpoint() first — Spark refuses to overwrite a path it is
    # still lazily reading from, and the slice is bounded by touched days
    merged = merge_additive(existing, delta, keys=["date"]).localCheckpoint()
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(view_path)
    )
