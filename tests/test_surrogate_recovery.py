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


def test_changepoint_divergence_is_the_global_ols_line():
    """THE documented divergence from Prophet (r7 VERDICT #6): Prophet's
    piecewise trend re-slopes after a changepoint
    (forecast_script.py:171-177 runs Prophet defaults, changepoint_range
    0.8), while fourier_ridge fits ONE global trend — so on a
    slope-break series the surrogate extrapolates the global OLS line of
    the history, not the last segment.

    The bound this pins (slope 0.5 -> -0.5 at 75% of a 240-day fit,
    weekly amp 12, noise sigma 1):
      * the surrogate's extrapolated slope equals the global OLS slope
        of the noiseless piecewise trend within 2% — the divergence MODE
        is exactly 'global line vs last segment', nothing else leaks;
      * the divergence from the piecewise ideal therefore grows at
        ~(ols_slope - s2) ~ 0.85/day of horizon (measured 0.8466);
        the 28-day MAE vs the piecewise truth is ~45 (pinned 30..60),
        vs ~0.24 on the no-changepoint control — callers needing
        post-changepoint accuracy must use the prophet backend
        (auto-selected when importable) or refit on post-break history.
    """
    n, brk, s1, s2, h = 240, 180, 0.5, -0.5, 28
    rng = np.random.default_rng(7)
    t = np.arange(n, dtype=float)
    trend = 100.0 + np.where(t < brk, s1 * t, s1 * brk + s2 * (t - brk))
    y = trend + 12.0 * np.sin(2 * np.pi * t / 7.0) + rng.normal(0, 1.0, n)
    ds = pd.date_range("2022-01-03", periods=n, freq="D")
    m = AdditiveForecastModel().fit(pd.DataFrame({"ds": ds, "y": y}))

    # 1) divergence mode: recovered slope == global OLS slope of the
    # noiseless piecewise trend (70-day probe cancels the weekly term)
    probe = pd.DataFrame(
        {"ds": [ds[-1], ds[-1] + pd.Timedelta(days=70)]}
    )
    p = m.predict(probe)
    daily = (p["yhat"].iloc[1] - p["yhat"].iloc[0]) / 70.0
    ols = np.polyfit(t, trend, 1)[0]
    assert abs(daily - ols) < 0.02 * abs(ols), f"{daily:.4f} vs OLS {ols:.4f}"
    # and that line genuinely diverges from the last segment's slope
    assert daily - s2 > 0.8, f"divergence rate {daily - s2:.3f}/day"

    # 2) magnitude: 28-day MAE vs the piecewise truth sits in the
    # measured band; the no-changepoint control stays ~two orders lower
    th = np.arange(n, n + h, dtype=float)
    truth = (
        100.0 + s1 * brk + s2 * (th - brk)
        + 12.0 * np.sin(2 * np.pi * th / 7.0)
    )
    fut = m.predict(
        pd.DataFrame(
            {"ds": pd.date_range(ds[-1] + pd.Timedelta(days=1), periods=h)}
        )
    )
    mae = float(np.mean(np.abs(fut["yhat"].to_numpy() - truth)))
    assert 30.0 < mae < 60.0, f"changepoint 28d MAE {mae:.2f}"

    y0 = 100.0 + s1 * t + 12.0 * np.sin(2 * np.pi * t / 7.0) + rng.normal(
        0, 1.0, n
    )
    m0 = AdditiveForecastModel().fit(pd.DataFrame({"ds": ds, "y": y0}))
    fut0 = m0.predict(
        pd.DataFrame(
            {"ds": pd.date_range(ds[-1] + pd.Timedelta(days=1), periods=h)}
        )
    )
    truth0 = 100.0 + s1 * th + 12.0 * np.sin(2 * np.pi * th / 7.0)
    mae0 = float(np.mean(np.abs(fut0["yhat"].to_numpy() - truth0)))
    assert mae0 < 1.0, f"control MAE {mae0:.2f}"
    assert mae > 30 * mae0
