"""Per-series additive time-series model (SURVEY M1-M3).

The reference fits one default-config ``Prophet()`` per numeric column
(forecast_script.py:171-177) and predicts ``yhat / yhat_lower / yhat_upper``
over history ∪ `interval` future days. Prophet's default is an additive model:
piecewise-linear trend + weekly/yearly Fourier seasonalities, MAP-fit, with an
80% uncertainty interval.

This module provides the same contract with a swappable backend:

- ``prophet`` backend when the library is importable (same defaults the
  reference uses);
- ``fourier_ridge`` backend otherwise (always available): deterministic
  ridge regression on [intercept, linear trend, weekly Fourier (k=3),
  yearly Fourier (k=10)] with an 80% residual-quantile interval. This is the
  documented surrogate of SURVEY §7.5 — same model family as Prophet's MAP
  fit minus changepoints, fully deterministic, no native deps.

Both backends are **driver-free**: they run inside ``applyInPandas`` workers,
one (table, metric) series per group (see forecaster.py). Each series must
fit one worker's memory — the same constraint Prophet itself has; the
distributed win is that thousands of series fit in parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

try:  # pragma: no cover - environment-dependent
    from prophet import Prophet  # noqa: F401

    HAVE_PROPHET = True
except Exception:  # pragma: no cover
    HAVE_PROPHET = False

# Prophet's default interval_width=0.80 -> 10%/90% quantiles.
INTERVAL_LO_Q = 0.10
INTERVAL_HI_Q = 0.90
# tiny ridge term: numerical conditioning only (lstsq handles the rest);
# anything large visibly shrinks trend/seasonal amplitudes
_RIDGE_ALPHA = 1e-6


class AdditiveForecastModel:
    """Deterministic additive model: trend + weekly/yearly Fourier seasonality.

    fit() on a (ds, y) frame; predict() on a ds axis returns
    (ds, yhat, yhat_lower, yhat_upper). Seasonality terms auto-enable by
    history span like Prophet: weekly needs >=14 days, yearly >=370 days.
    """

    def __init__(self, weekly_order: int = 3, yearly_order: int = 10):
        self.weekly_order = weekly_order
        self.yearly_order = yearly_order
        self._beta: np.ndarray | None = None
        self._t0: pd.Timestamp | None = None
        self._scale_days: float = 1.0
        self._resid_lo: float = 0.0
        self._resid_hi: float = 0.0
        self._weekly_on = False
        self._yearly_on = False

    def _design(self, ds: pd.Series) -> np.ndarray:
        days = (ds - self._t0).dt.total_seconds().to_numpy() / 86400.0
        t = days / self._scale_days
        cols = [np.ones_like(t), t]
        if self._weekly_on:
            for k in range(1, self.weekly_order + 1):
                w = 2.0 * np.pi * k * days / 7.0
                cols.append(np.sin(w))
                cols.append(np.cos(w))
        if self._yearly_on:
            for k in range(1, self.yearly_order + 1):
                w = 2.0 * np.pi * k * days / 365.25
                cols.append(np.sin(w))
                cols.append(np.cos(w))
        return np.column_stack(cols)

    def fit(self, df: pd.DataFrame) -> "AdditiveForecastModel":
        history = df.dropna(subset=["y"]).copy()
        if len(history) < 2:
            raise ValueError("need >=2 observations to fit")  # Prophet raises here too
        ds = pd.to_datetime(history["ds"])
        y = history["y"].to_numpy(dtype=np.float64)
        self._t0 = ds.min()
        span = max((ds.max() - self._t0).total_seconds() / 86400.0, 1.0)
        self._scale_days = span
        self._weekly_on = span >= 14
        self._yearly_on = span >= 370
        X = self._design(ds)
        # ridge via augmented least-squares: deterministic, well-conditioned
        n_feat = X.shape[1]
        aug = np.sqrt(_RIDGE_ALPHA) * np.eye(n_feat)
        aug[0, 0] = 0.0  # don't shrink the intercept
        Xa = np.vstack([X, aug])
        ya = np.concatenate([y, np.zeros(n_feat)])
        self._beta, *_ = np.linalg.lstsq(Xa, ya, rcond=None)
        resid = y - X @ self._beta
        self._resid_lo = float(np.quantile(resid, INTERVAL_LO_Q))
        self._resid_hi = float(np.quantile(resid, INTERVAL_HI_Q))
        return self

    def predict(self, future: pd.DataFrame) -> pd.DataFrame:
        ds = pd.to_datetime(future["ds"])
        X = self._design(ds)
        yhat = X @ self._beta
        return pd.DataFrame(
            {
                "ds": ds,
                "yhat": yhat,
                "yhat_lower": yhat + self._resid_lo,
                "yhat_upper": yhat + self._resid_hi,
            }
        )


def make_future_axis(history_ds: pd.Series, periods: int) -> pd.DataFrame:
    """Prophet's make_future_dataframe semantics (forecast_script.py:174):
    sorted unique history dates + `periods` daily steps after max."""
    ds = pd.to_datetime(pd.Series(history_ds)).dropna()
    hist = ds.drop_duplicates().sort_values()
    last = hist.max()
    fut = pd.date_range(last, periods=periods + 1, freq="D")[1:]
    return pd.DataFrame({"ds": pd.concat([hist, pd.Series(fut)], ignore_index=True)})


def fit_predict_frame(
    pdf: pd.DataFrame,
    periods: int,
    only_future: bool = False,
    backend: str = "auto",
) -> pd.DataFrame:
    """Fit one series and score the extended axis — the worker-side body of
    the distributed forecaster. Input columns: ds, y. Output: ds, yhat,
    yhat_lower, yhat_upper.

    only_future keeps rows strictly after max(history ds)
    (forecast_script.py:175-176).
    """
    use_prophet = backend == "prophet" or (backend == "auto" and HAVE_PROPHET)
    history = pdf.dropna(subset=["y"])
    future = make_future_axis(history["ds"], periods)
    last_known = pd.to_datetime(history["ds"]).max()
    if only_future:
        future = future[future["ds"] > last_known]
    if use_prophet:  # pragma: no cover - only when prophet installed
        from prophet import Prophet

        m = Prophet()
        m.fit(history.rename(columns={})[["ds", "y"]])
        out = m.predict(future)[["ds", "yhat", "yhat_lower", "yhat_upper"]]
        return out
    model = AdditiveForecastModel().fit(history)
    return model.predict(future)
