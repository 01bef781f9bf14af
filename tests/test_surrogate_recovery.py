"""Quantitative ground-truth recovery bounds for the fourier_ridge
surrogate (VERDICT r3 residual #1 / next-round #2).

Prophet cannot be installed in this container (no pip/apt), so the
prophet-vs-surrogate parity tests in test_prophet_parity.py stay
env-gated. These tests close the gap from the other side: instead of
comparing to Prophet, they fit the surrogate on series with KNOWN
analytic structure (the additive trend+seasonality family BOTH models
assume) and pin hard numeric bounds on what a correct implementation
must recover — out-of-sample accuracy vs the noiseless truth, 80%%
interval coverage on held-out noise, trend-slope recovery, and the
span-gated seasonality activations. A surrogate regression that would
break Prophet parity (wrong Fourier period, broken interval quantiles,
trend leakage into seasonal terms) breaks these bounds first. The
measured values are recorded in NOTES_r4.md as the tolerance table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from clickhouse_forecasting_spark.forecast.model import (
    AdditiveForecastModel,
    fit_predict_frame,
)


def _series(n_days, slope=0.5, wk_amp=12.0, yr_amp=0.0, noise=2.0, seed=7):
    rng = np.random.default_rng(seed)
    ds = pd.date_range("2022-01-03", periods=n_days, freq="D")
    t = np.arange(n_days, dtype=float)
    truth = (
        100.0
        + slope * t
        + wk_amp * np.sin(2 * np.pi * t / 7.0)
        + yr_amp * np.sin(2 * np.pi * t / 365.25)
    )
    y = truth + rng.normal(0.0, noise, n_days)
    return pd.DataFrame({"ds": ds, "y": y}), truth, slope


def test_out_of_sample_mae_vs_noiseless_truth():
    """14-day horizon MAE against the NOISELESS generator must stay
    well under the noise floor x2 — the surrogate extrapolates the
    structure, it doesn't chase residuals. Measured ~0.6 with
    sigma=2.0; bound at 2.0 (1 sigma) with >3x margin."""
    n, horizon = 240, 14
    df, _, slope = _series(n + horizon)
    fit_df = df.iloc[:n]
    out = fit_predict_frame(fit_df, periods=horizon, backend="fourier_ridge")
    future = out.tail(horizon)
    t = np.arange(n, n + horizon, dtype=float)
    truth = 100.0 + slope * t + 12.0 * np.sin(2 * np.pi * t / 7.0)
    mae = float(np.mean(np.abs(future["yhat"].to_numpy() - truth)))
    assert mae < 2.0, f"horizon MAE {mae:.3f} exceeds the 1-sigma bound"


def test_interval_coverage_near_nominal():
    """The 80%% residual-quantile interval must cover ~80%% of held-out
    noisy observations (binomial 95%% band for 120 draws ~ [0.72,
    0.87]; allow [0.68, 0.92] so the pin survives seed changes)."""
    n, horizon = 240, 120
    df, _, slope = _series(n + horizon, seed=11)
    fit_df = df.iloc[:n]
    out = fit_predict_frame(fit_df, periods=horizon, backend="fourier_ridge")
    future = out.tail(horizon).reset_index(drop=True)
    actual = df["y"].to_numpy()[n:]
    covered = np.mean(
        (actual >= future["yhat_lower"].to_numpy())
        & (actual <= future["yhat_upper"].to_numpy())
    )
    assert 0.68 <= covered <= 0.92, f"80% interval covered {covered:.2f}"


def test_trend_slope_recovery():
    """On pure trend + noise the fitted daily slope must land within
    5%% of the generator's (the model's t column is span-scaled, so
    recover the slope from two noiseless-feature predictions)."""
    df, _, slope = _series(300, wk_amp=0.0, noise=1.0, seed=3)
    model = AdditiveForecastModel().fit(df)
    # predict on two dates 70 days apart, a multiple of 7 so any
    # residual weekly term cancels exactly
    probe = pd.DataFrame(
        {"ds": [df["ds"].iloc[-1], df["ds"].iloc[-1] + pd.Timedelta(days=70)]}
    )
    pred = model.predict(probe)
    daily = (pred["yhat"].iloc[1] - pred["yhat"].iloc[0]) / 70.0
    assert abs(daily - slope) < 0.05 * slope, f"slope {daily:.4f} vs {slope}"


def test_seasonality_gates_match_prophet_spans():
    """Prophet auto-enables weekly at >=2 weeks and yearly at >=2
    cycles-ish; the surrogate documents >=14 / >=370 days. Pin the
    gates: a 10-day fit must NOT have weekly terms, a 400-day fit must
    have both."""
    short, _, _ = _series(10, noise=0.5)
    m_short = AdditiveForecastModel().fit(short)
    assert not m_short._weekly_on and not m_short._yearly_on
    long, _, _ = _series(400, yr_amp=20.0, noise=0.5)
    m_long = AdditiveForecastModel().fit(long)
    assert m_long._weekly_on and m_long._yearly_on


def test_yearly_component_recovered_when_present():
    """With a 2-year fit containing a 20-amplitude yearly sine, the
    model's 180-day-out prediction must track the yearly phase: MAE vs
    the noiseless generator under 4.0 (20%% of amplitude). A wrong
    yearly period or a dropped component costs ~12+ here."""
    n, horizon = 740, 180
    df, _, slope = _series(n + horizon, yr_amp=20.0, noise=2.0, seed=5)
    out = fit_predict_frame(
        df.iloc[:n], periods=horizon, backend="fourier_ridge"
    )
    future = out.tail(horizon)
    t = np.arange(n, n + horizon, dtype=float)
    truth = (
        100.0
        + slope * t
        + 12.0 * np.sin(2 * np.pi * t / 7.0)
        + 20.0 * np.sin(2 * np.pi * t / 365.25)
    )
    mae = float(np.mean(np.abs(future["yhat"].to_numpy() - truth)))
    assert mae < 4.0, f"180-day yearly-phase MAE {mae:.3f}"
