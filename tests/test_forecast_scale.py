"""Forecast-at-scale structural pins (VERDICT r4 #7): the many-series
fan-out must keep its parallel shape — the properties that make 10k (or
10M) series a width problem, not a latency problem.

The serial-collapse failure mode these pins guard: AQE's byte-based
shuffle coalescing merged the fit stage into ONE python worker (32
groups x 1s compute ran in 33s wall before the fanout_partitions fix in
forecaster.py). Byte-cheap / CPU-heavy Python stages must pin their own
width.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_forecasting_spark.forecast.forecaster import SeriesForecaster
from clickhouse_forecasting_spark.sources import seriesgen


N_SERIES = 2000
DAYS = 30
INTERVAL = 7


@pytest.fixture(scope="module")
def scale_out(spark):
    seriesgen.register(spark)
    df = (
        spark.read.format("seriesgen")
        .option("series", str(N_SERIES))
        .option("days", str(DAYS))
        .load()
    )
    long_df = df.select(
        F.col("date").alias("ds"),
        F.col("series_id").cast("string").alias("metric"),
        F.col("y"),
    )
    fc = SeriesForecaster(interval=INTERVAL, only_future=True)
    return fc.transform_long(long_df)


def test_scan_partitions_are_batched(spark):
    seriesgen.register(spark)
    df = (
        spark.read.format("seriesgen")
        .option("series", str(N_SERIES))
        .option("days", "3")
        .load()
    )
    # 2000 series must NOT be 2000 scan tasks (measured ~11ms of pure
    # task-launch each); the source caps at 512 strided partitions
    assert df.rdd.getNumPartitions() == 512
    # and the stride loses nothing: every series exactly once per day
    assert df.count() == N_SERIES * 3
    assert df.select("series_id").distinct().count() == N_SERIES


def test_fit_stage_width_survives_aqe(spark, scale_out):
    # the fit output keeps the pinned fan-out width — AQE must not have
    # coalesced the Python stage to fewer partitions than the session's
    # parallelism
    want = spark.sparkContext.defaultParallelism
    assert scale_out.rdd.getNumPartitions() == want


def test_single_exchange_feeds_the_fit(spark):
    # fresh frame: an executed fixture's plan string mutates under AQE
    # (stage wrappers double-count "Exchange")
    seriesgen.register(spark)
    df = (
        spark.read.format("seriesgen")
        .option("series", "50")
        .option("days", "20")
        .load()
    )
    long_df = df.select(
        F.col("date").alias("ds"),
        F.col("series_id").cast("string").alias("metric"),
        F.col("y"),
    )
    out = SeriesForecaster(interval=INTERVAL, only_future=True).transform_long(
        long_df
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # r9: the batched partition fitter replaced per-group applyInPandas
    assert "MapInPandas" in plan
    # exactly one exchange: the keyed repartition co-locates each series'
    # rows; the batched fitter is a narrow map over that partitioning
    assert plan.count("Exchange") == 1, plan[:600]


def test_every_series_fit_with_bounded_output(scale_out):
    per = scale_out.groupBy("metric").agg(F.count("*").alias("n"))
    stats = per.agg(
        F.count("*").alias("n_series"),
        F.min("n").alias("lo"),
        F.max("n").alias("hi"),
    ).collect()[0]
    # all series present, each exactly INTERVAL rows (only_future)
    assert stats.n_series == N_SERIES
    assert stats.lo == INTERVAL and stats.hi == INTERVAL


def test_fit_tasks_are_balanced(scale_out):
    # hash partitioning on series id must spread the CPU: no partition
    # holds more than 3x the mean share of series
    spread = (
        scale_out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.countDistinct("metric").alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("avg"))
        .collect()[0]
    )
    assert spread.mx <= 3 * spread.avg, (spread.mx, spread.avg)


def test_poison_series_isolated_at_fanout_scale(spark):
    """M4 fault isolation AT SCALE: among 300 concurrent fits, the
    series with <2 observations must contribute zero rows while every
    healthy series completes — one poison group cannot fail the job or
    leak into other groups' output."""
    import datetime

    n_series, days = 300, 20
    rows = []
    for sid in range(n_series):
        n_obs = 1 if sid % 50 == 0 else days  # every 50th series poison
        for d in range(n_obs):
            rows.append((datetime.date(2024, 1, 1) + datetime.timedelta(days=d),
                         str(sid), 100.0 + sid + d))
    long_df = spark.createDataFrame(rows, "ds date, metric string, y double")
    fc = SeriesForecaster(interval=INTERVAL, only_future=True)
    out = fc.transform_long(long_df)
    per = {r.metric: r.n for r in
           out.groupBy("metric").agg(F.count("*").alias("n")).collect()}
    poison = {str(s) for s in range(0, n_series, 50)}
    assert set(per) == {str(s) for s in range(n_series)} - poison
    assert all(n == INTERVAL for n in per.values())


def test_backtest_fanout_width_survives_aqe(spark):
    """r5 VERDICT #5: backtest multiplies series × cutoffs through the
    SAME transform_long keyed repartition — the fit stage must keep the
    pinned width with the multiplied (cutoff, metric) key space, exactly
    like the plain path (the AQE serial-collapse defense is inside
    transform_long, so this proves it covers the backtest entry point)."""
    seriesgen.register(spark)
    df = (
        spark.read.format("seriesgen")
        .option("series", str(N_SERIES))
        .option("days", str(DAYS))
        .load()
    )
    long_df = df.select(
        F.col("date").alias("ds"),
        F.col("series_id").cast("string").alias("metric"),
        F.col("y"),
    )
    fc = SeriesForecaster(interval=INTERVAL, only_future=True)
    cutoffs = ["2024-01-16", "2024-01-23"]
    train = None
    for c in cutoffs:
        t = long_df.filter(F.col("ds") <= F.lit(c)).withColumn("cutoff", F.lit(c))
        train = t if train is None else train.unionByName(t)
    preds = fc.transform_long(train, group_cols=["cutoff"])
    assert preds.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    plan = preds._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_backtest_scores_every_cell_once(spark):
    seriesgen.register(spark)
    df = (
        spark.read.format("seriesgen")
        .option("series", "200")
        .option("days", str(DAYS))
        .load()
    )
    long_df = df.select(
        F.col("date").alias("ds"),
        F.col("series_id").cast("string").alias("metric"),
        F.col("y"),
    )
    fc = SeriesForecaster(interval=INTERVAL, only_future=True)
    out = fc.backtest(long_df, ["2024-01-16", "2024-01-23"]).collect()
    assert len(out) == 200 * 2
    assert all(r.n_scored == INTERVAL for r in out)
    assert all(0.0 <= r.coverage <= 1.0 for r in out)
