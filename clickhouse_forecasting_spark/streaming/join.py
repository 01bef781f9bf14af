"""Stream-stream join: click-to-view attribution within a time window.

The last streaming-join tier the engine needs (stream-static enrichment
is in rollup.py): two watermarked event streams joined on key + a
time-RANGE predicate. Spark keeps both sides' state only for rows whose
event time is still joinable given the watermark and the range bound —
state size tracks (events within the attribution window), not stream
history, which is what makes the join runnable forever at 100 TB/day.

Batch and stream share the identical join expression (tested equal), so
backfills run the same code on static frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    window_minutes: int = 30,
    watermark: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """Attribute each click to the views by the same user in the preceding
    `window_minutes`. Inner join; the time-range bound is what lets the
    streaming engine expire state (both watermarks + the range give a
    provable retention horizon per side)."""
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    if streaming:
        v = v.withWatermark("view_ts", watermark)
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"interval {window_minutes} minutes")
        )
    )
    return v.join(c, cond).select(
        "user_id", "view_id", "view_ts", "click_id", "click_ts", "click_value"
    )
