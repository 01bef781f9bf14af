import datetime as dt

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_forecasting_spark import relational as R


def _daily(spark, n=10, start=dt.date(2024, 1, 1)):
    rows = [
        Row(date=start + dt.timedelta(days=i), a=float(i), b=float(2 * i)) for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_scan_metrics_projects_and_sorts(spark):
    df = _daily(spark)
    out = R.scan_metrics(df, ["a"])
    assert out.columns == ["date", "a"]
    dates = [r.date for r in out.collect()]
    assert dates == sorted(dates)


def test_is_empty_guard(spark):
    df = _daily(spark)
    assert not R.is_empty(df)
    assert R.is_empty(df.filter(F.col("a") < 0))


def test_cast_axis_to_date_coerces(spark):
    df = spark.createDataFrame([Row(date="2024-01-02"), Row(date="garbage")])
    out = R.cast_axis_to_date(df).collect()
    assert out[0].date == dt.date(2024, 1, 2)
    assert out[1].date is None  # errors='coerce' parity (forecast_script.py:181)


def test_last_known_date(spark):
    df = _daily(spark, n=5)
    assert R.last_known_date(df) == dt.date(2024, 1, 5)


def test_unpivot_roundtrip_pivot(spark):
    # property: pivot(unpivot(wide)) == wide (SURVEY §5.2 property test)
    df = _daily(spark, n=6)
    long_df = R.unpivot_metrics(df, ["a", "b"])
    assert long_df.columns == ["ds", "metric", "y"]
    assert long_df.count() == 12
    back = (
        long_df.groupBy("ds").pivot("metric", ["a", "b"]).agg(F.first("y"))
        .withColumnRenamed("ds", "date")
    )
    orig = {(r.date, r.a, r.b) for r in df.collect()}
    got = {(r.date, r.a, r.b) for r in back.collect()}
    assert orig == got


def test_future_date_axis(spark):
    df = _daily(spark, n=5)
    axis = R.future_date_axis(df, periods=3)
    got = sorted(r.ds for r in axis.collect())
    assert got[0] == dt.date(2024, 1, 1)
    assert got[-1] == dt.date(2024, 1, 8)  # 5 history + 3 future
    assert len(got) == 8


def test_only_future_strictness(spark):
    df = _daily(spark, n=5).withColumnRenamed("date", "ds")
    out = R.only_future(df, dt.date(2024, 1, 3))
    assert sorted(r.ds for r in out.collect()) == [dt.date(2024, 1, 4), dt.date(2024, 1, 5)]


def test_outer_join_null_fill(spark):
    # R11/R12: k-way full outer join keeps all dates, gaps are NULL
    f1 = spark.createDataFrame([Row(ds=dt.date(2024, 1, 1), a=1.0), Row(ds=dt.date(2024, 1, 2), a=2.0)])
    f2 = spark.createDataFrame([Row(ds=dt.date(2024, 1, 2), b=20.0), Row(ds=dt.date(2024, 1, 3), b=30.0)])
    out = {r.ds: (r.a, r.b) for r in R.outer_join_on_date([f1, f2]).collect()}
    assert out[dt.date(2024, 1, 1)] == (1.0, None)
    assert out[dt.date(2024, 1, 2)] == (2.0, 20.0)
    assert out[dt.date(2024, 1, 3)] == (None, 30.0)


def test_sink_column_order(spark):
    # R13: date, all cols, all _min, all _max (forecast_script.py:204)
    assert R.sink_column_order(["x", "y"]) == ["date", "x", "y", "x_min", "y_min", "x_max", "y_max"]


def test_gap_fill_interpolate(spark):
    df = spark.createDataFrame(
        [
            Row(date=dt.date(2024, 1, 1), v=10.0),
            Row(date=dt.date(2024, 1, 4), v=40.0),  # gap: Jan 2, 3
            Row(date=dt.date(2024, 1, 5), v=None),  # observed NULL also fills
            Row(date=dt.date(2024, 1, 6), v=60.0),
        ]
    )
    out = {r.date: r.v for r in R.gap_fill(df, ["v"]).collect()}
    assert out[dt.date(2024, 1, 2)] == pytest.approx(20.0)
    assert out[dt.date(2024, 1, 3)] == pytest.approx(30.0)
    assert out[dt.date(2024, 1, 5)] == pytest.approx(50.0)
    assert out[dt.date(2024, 1, 1)] == 10.0 and out[dt.date(2024, 1, 6)] == 60.0


def test_gap_fill_ffill_and_edges(spark):
    df = spark.createDataFrame(
        [
            Row(date=dt.date(2024, 1, 2), v=10.0),
            Row(date=dt.date(2024, 1, 5), v=40.0),
        ]
    )
    ff = {r.date: r.v for r in R.gap_fill(df, ["v"], method="ffill").collect()}
    assert ff[dt.date(2024, 1, 3)] == 10.0 and ff[dt.date(2024, 1, 4)] == 10.0
    # spine starts at min(date): no leading synthetic dates
    assert min(ff) == dt.date(2024, 1, 2) and max(ff) == dt.date(2024, 1, 5)
