"""The custom Python DataSource (seriesgen) behind spark.read.format().

Covers the source contract: schema, partition-parallel scan, determinism
(two reads are identical), option handling, and end-to-end compatibility
with the forecaster (a custom source is a first-class table).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_forecasting_spark.sources import seriesgen


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    seriesgen.register(spark)


def _load(spark, **opts):
    r = spark.read.format("seriesgen")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_shape_and_schema(spark):
    df = _load(spark, days=30, series=3)
    assert [f.name for f in df.schema.fields] == ["date", "series_id", "y"]
    assert df.count() == 90
    per = {r.series_id: r.n for r in df.groupBy("series_id").agg(F.count("*").alias("n")).collect()}
    assert per == {0: 30, 1: 30, 2: 30}


def test_deterministic_across_reads(spark):
    a = _load(spark, days=45, series=2).collect()
    b = _load(spark, days=45, series=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_partitioned_scan_parallelism(spark):
    df = _load(spark, days=10, series=5)
    # one InputPartition per series -> 5 scan partitions
    assert df.rdd.getNumPartitions() == 5
    # and each partition holds exactly one series (no cross-talk)
    counts = df.withColumn("pid", F.spark_partition_id()).groupBy("pid").agg(
        F.countDistinct("series_id").alias("k")
    ).collect()
    assert all(r.k == 1 for r in counts)


def test_weekly_seasonality_present(spark):
    df = _load(spark, days=140, series=1, amplitude=25.0)
    dow = (
        df.groupBy(F.weekday("date").alias("d"))
        .agg(F.avg("y").alias("m"))
        .collect()
    )
    ms = {r.d: r.m for r in dow}
    # amplitude 25 dominates trend/noise: the seasonal spread must show
    assert max(ms.values()) - min(ms.values()) > 20.0


def test_feeds_the_forecaster(spark):
    from clickhouse_forecasting_spark.forecast import SeriesForecaster

    df = _load(spark, days=120, series=2).withColumnRenamed("y", "metric")
    wide = df.groupBy("date").pivot("series_id", ["0", "1"]).agg(F.first("metric"))
    fc = SeriesForecaster(interval=7, only_future=True).transform(
        wide.select(F.col("date"), F.col("0").alias("s0"), F.col("1").alias("s1"))
    )
    rows = fc.collect()
    assert len(rows) == 7
    for r in rows:
        assert r.s0_min <= r.s0 <= r.s0_max


# ------------------------------------------------------- streaming (r4)


def test_stream_reader_offsets_replay_exactly():
    """The WAL-recovery contract: readBetweenOffsets must regenerate
    precisely the rows read() emitted for the same offset range."""
    from clickhouse_forecasting_spark.sources.seriesgen import (
        SeriesGenStreamReader,
    )

    r = SeriesGenStreamReader(
        {"series": "4", "batch_days": "6", "max_days": "30"}
    )
    off = r.initialOffset()
    assert off == {"day": 0}
    rows1, off1 = r.read(off)
    assert off1 == {"day": 6} and len(rows1) == 4 * 6
    assert r.readBetweenOffsets(off, off1) == rows1
    rows2, off2 = r.read(off1)
    assert off2 == {"day": 12}
    assert r.readBetweenOffsets(off1, off2) == rows2
    # the bound: reads past max_days emit empty batches, offset pinned
    rows_end, off_end = r.read({"day": 30})
    assert rows_end == [] and off_end == {"day": 30}


def test_streaming_source_matches_batch_generator(spark):
    """readStream.format('seriesgen') must emit bit-identical rows to
    the batch reader over the same day range — the same-options,
    same-table determinism contract, now across BOTH halves of the
    DataSource API."""
    import time

    seriesgen.register(spark)
    df = (
        spark.readStream.format("seriesgen")
        .option("series", "3")
        .option("batch_days", "5")
        .option("max_days", "20")
        .load()
    )
    assert df.isStreaming
    q = (
        df.writeStream.format("memory")
        .queryName("sg_stream_parity")
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("sg_stream_parity").count() >= 60:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("sg_stream_parity").collect()))
    want = sorted(
        map(
            tuple,
            spark.read.format("seriesgen")
            .option("series", "3")
            .option("days", "20")
            .load()
            .collect(),
        )
    )
    assert got == want
