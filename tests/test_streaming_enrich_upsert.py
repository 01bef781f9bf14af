"""Stream-static enrichment join and the foreachBatch upsert sink.

Both are replayed through real Structured Streaming queries
(availableNow drains the fixture backlog then stops) and compared to the
equivalent batch computation.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_forecasting_spark.sources import read_table
from clickhouse_forecasting_spark.streaming import (
    daily_rollup_stream,
    enrich_with_static_dim,
    stream_upsert_daily,
)
from clickhouse_forecasting_spark.streaming.rollup import EVENTS_SCHEMA


def test_stream_static_enrichment_join(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("error", "ops")],
        ["event_type", "category"],
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    enriched = (
        enrich_with_static_dim(stream, dim, on="event_type")
        .groupBy("category")
        .agg(F.count("*").alias("n"))
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in 120s"
    got = {r.category: r.n for r in spark.table("enrich_test").collect()}
    want = {
        r.category: r.n
        for r in events.join(dim, "event_type", "left")
        .groupBy("category")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    # unmapped types (if any) surface as a NULL category, never dropped
    assert sum(got.values()) == events.count()


def test_stream_upsert_daily_matches_batch(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    # several files so maxFilesPerTrigger yields multiple micro-batches,
    # forcing the upsert path to REWRITE days that straddle batches
    events.repartition(8).write.parquet(src)
    sink = str(tmp_path / "daily_sink")
    ckpt = str(tmp_path / "ckpt")
    # repartition scatters rows across files in random time order, so the
    # watermark must span the fixture: this test exercises the upsert
    # sink's multi-batch rewrite, not late-data dropping (covered in
    # test_extensions / dedup_stream tests)
    q = stream_upsert_daily(
        spark, src, sink, ckpt, watermark="60 days", max_files_per_trigger=2
    )
    assert q.awaitTermination(180), "stream did not finish in 180s"
    got = {
        r.date: (r.event_count, r.total_value)
        for r in spark.read.parquet(sink)
        .select("date", "event_count", "total_value")
        .collect()
    }
    want = {
        r.date: (r.event_count, r.total_value)
        for r in daily_rollup_stream(events).collect()
    }
    assert set(got) == set(want)
    for d, (n, v) in want.items():
        assert got[d][0] == n, d
        assert got[d][1] == pytest.approx(v, rel=1e-9)


def test_stream_stream_attribution_join_matches_batch(spark, sf_dir, tmp_path):
    from clickhouse_forecasting_spark.streaming import attribution_join

    events = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    sv = stream.filter(F.col("event_type") == "view")
    sc = stream.filter(F.col("event_type") == "click")
    q = (
        attribution_join(sv, sc, window_minutes=30, watermark="60 days")
        .writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in 180s"
    got = {
        (r.view_id, r.click_id) for r in spark.table("attr_test").collect()
    }
    bv = events.filter(F.col("event_type") == "view")
    bc = events.filter(F.col("event_type") == "click")
    want = {
        (r.view_id, r.click_id)
        for r in attribution_join(bv, bc, window_minutes=30, streaming=False).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture must actually produce attributions
