import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_forecasting_spark.forecast import SeriesForecaster
from clickhouse_forecasting_spark.forecast.model import (
    AdditiveForecastModel,
    fit_predict_frame,
    make_future_axis,
)


def _series(n=120, start="2024-01-01"):
    ds = pd.date_range(start, periods=n, freq="D")
    t = np.arange(n, dtype=float)
    y = 10 + 0.5 * t + 3 * np.sin(2 * np.pi * t / 7)
    return pd.DataFrame({"ds": ds, "y": y})


def test_model_learns_trend_and_seasonality():
    df = _series()
    model = AdditiveForecastModel().fit(df)
    pred = model.predict(df[["ds"]])
    rmse = float(np.sqrt(np.mean((pred["yhat"].to_numpy() - df["y"].to_numpy()) ** 2)))
    assert rmse < 0.5  # near-perfect on a noiseless additive series


def test_interval_invariant_lower_leq_yhat_leq_upper():
    out = fit_predict_frame(_series(), periods=14)
    assert (out["yhat_lower"] <= out["yhat"] + 1e-9).all()
    assert (out["yhat"] <= out["yhat_upper"] + 1e-9).all()


def test_make_future_axis_semantics():
    # Prophet make_future_dataframe parity: history dates + N daily steps
    df = _series(n=10)
    axis = make_future_axis(df["ds"], periods=5)
    assert len(axis) == 15
    assert axis["ds"].iloc[-1] == pd.Timestamp("2024-01-15")


def test_only_future_returns_exactly_interval_rows():
    out = fit_predict_frame(_series(n=30), periods=7, only_future=True)
    assert len(out) == 7
    assert out["ds"].min() == pd.Timestamp("2024-01-31")


def test_determinism():
    a = fit_predict_frame(_series(), periods=7, backend="fourier_ridge")
    b = fit_predict_frame(_series(), periods=7, backend="fourier_ridge")
    pd.testing.assert_frame_equal(a, b)


def test_single_point_series_raises():
    with pytest.raises(ValueError):
        AdditiveForecastModel().fit(pd.DataFrame({"ds": [pd.Timestamp("2024-01-01")], "y": [1.0]}))


def test_distributed_matches_local(spark):
    """Distributed applyInPandas output == single-machine model run (SURVEY §5.2c):
    the local fit of the same series IS the oracle for M1/M2."""
    pdf = _series(n=60)
    df = spark.createDataFrame(
        [Row(date=d.date(), m=float(v)) for d, v in zip(pdf["ds"], pdf["y"])]
    )
    dist = (
        SeriesForecaster(interval=7, backend="fourier_ridge")
        .transform(df)
        .orderBy("date")
        .toPandas()
    )
    local = fit_predict_frame(pdf, periods=7, backend="fourier_ridge")
    assert len(dist) == len(local)
    np.testing.assert_allclose(dist["m"].to_numpy(), local["yhat"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(dist["m_min"].to_numpy(), local["yhat_lower"].to_numpy(), rtol=1e-9)


def test_failed_series_null_fill(spark):
    """M4: a metric whose fit fails yields all-NULL columns, other metrics
    survive (forecast_script.py:196-198,207-211 NULL-fill semantics)."""
    rows = [
        Row(date=dt.date(2024, 1, 1) + dt.timedelta(days=i), good=float(i), bad=None)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, schema="date date, good double, bad double")
    out = SeriesForecaster(interval=3, backend="fourier_ridge").transform(df)
    agg = out.agg(
        F.count("good").alias("good_n"), F.count("bad").alias("bad_n"), F.count("*").alias("rows")
    ).collect()[0]
    assert agg.rows == 33
    assert agg.good_n == 33
    assert agg.bad_n == 0


def test_gapped_history_axis(spark):
    """Gapped dates: in-sample predictions only for observed dates + future
    (FIXTURES A5 bucket_gapped)."""
    days = [i for i in range(30) if i not in (5, 6, 12)]
    rows = [Row(date=dt.date(2024, 1, 1) + dt.timedelta(days=i), m=float(i)) for i in days]
    df = spark.createDataFrame(rows)
    out = SeriesForecaster(interval=2, backend="fourier_ridge").transform(df)
    got = sorted(r.date for r in out.select("date").collect())
    assert len(got) == len(days) + 2
    assert dt.date(2024, 1, 6) not in got
