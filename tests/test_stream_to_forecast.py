"""End-to-end composition: streaming ingest feeds the reference
pipeline. Events replay through the MERGE-upsert streaming sink into a
date-partitioned daily table inside a catalog database; the UNCHANGED
forecast pipeline then picks that table up (it is just another
date-keyed wide table) and materializes bucket_forecast_* from it —
the full "message bus -> rollup -> forecast" story with zero special
cases in either half.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_forecasting_spark.catalog import ParquetCatalog
from clickhouse_forecasting_spark.pipeline import run_forecast_pipeline
from clickhouse_forecasting_spark.sources import read_table
from clickhouse_forecasting_spark.streaming.rollup import (
    daily_rollup_stream,
    stream_upsert_daily,
)


def test_streamed_rollup_feeds_forecast_pipeline(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    db = tmp_path / "db"
    db.mkdir()
    sink = str(db / "daily_events.parquet")
    ckpt = str(tmp_path / "ckpt")

    q = stream_upsert_daily(spark, src, sink, ckpt)
    assert q.awaitTermination(180), "streaming upsert did not finish"

    # the streamed table must equal the batch rollup (same shared plan)
    streamed = spark.read.parquet(sink)
    want = daily_rollup_stream(events)
    assert streamed.count() == want.count()
    got_sum = streamed.agg(F.sum("event_count")).collect()[0][0]
    assert got_sum == events.count()

    # now the UNCHANGED pipeline forecasts the streamed table
    cat = ParquetCatalog(spark, str(db))
    counters = run_forecast_pipeline(cat, interval=7)
    assert counters.successful == ["daily_events"]
    assert counters.failed == [] and counters.failed_metrics == {}
    out = cat.table("bucket_forecast_daily_events")
    n_days = streamed.count()
    assert out.count() == n_days + 7  # history union exactly 7 future days
    for m in ("event_count", "total_value"):
        assert {m, f"{m}_min", f"{m}_max"} <= set(out.columns)
        viol = out.where(
            (F.col(f"{m}_min") > F.col(m)) | (F.col(m) > F.col(f"{m}_max"))
        ).count()
        assert viol == 0, m
    # future tail strictly after the streamed high-water mark
    hw = streamed.agg(F.max("date")).collect()[0][0]
    assert out.where(F.col("date") > hw).count() == 7
