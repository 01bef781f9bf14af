"""Distributed per-(table, metric) forecasting (SURVEY M1-M4, §7.1-7.2).

The reference runs a sequential driver loop: for each table, for each numeric
column, fit Prophet and predict (forecast_script.py:229,169-177) — one core,
one series at a time, with the whole table materialized in driver pandas
(:158). The Spark-native design inverts this:

    wide table --unpivot--> long (ds, metric, y)      [no Python, one narrow shuffle]
        --repartition(series key).mapInPandas(batched fit+predict)--> long forecasts
        --pivot(metric)--> wide (date, m, m_min, m_max, ...)

Each partition holds many whole series (keyed repartition) and the worker
fits them batched, sharing the per-axis work (model.batched_fit_predict_long)
— so a cluster fits N partitions of series concurrently and the driver never
sees row data. At 100 TB the per-worker constraint is that one PARTITION of
series fits one worker (sized by fanout_partitions); the shuffle is narrow
because the long frame carries only (ds, metric, y).

Fault isolation (M4, forecast_script.py:170,196-198): a failing series
returns an empty frame; its columns surface as all-NULL after the pivot and
the pipeline reports it failed — same observable semantics as the reference's
per-column try/except + NULL fill.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..relational import pivot_forecasts_wide, unpivot_metrics
from ..schema import DATE_AXIS_COLUMN, metric_columns
from .model import batched_fit_predict_long

_LONG_OUT_SCHEMA = "metric string, ds date, yhat double, yhat_lower double, yhat_upper double"


def series_proportional_fanout(n_series: int) -> int:
    """Fit-stage width ∝ SERIES COUNT, independent of cluster width
    (r12, guide §2.1 — partition counts proportional to input size).

    The batched fitter's per-task cost has a large constant (python
    worker round-trip, Arrow batch setup, per-cutoff axis prep) next to
    the per-series solve, so inheriting the session's core count makes
    the fit stage SLOWER on more cores at modest series counts
    (PERF_r11 scaling: forecast_backtest_scale 0.61, 8→32 cores at
    sf0.1). Target series-per-partition is `SPARK_GRAFT_SERIES_PER_PART`
    (default 192 — the measured overhead/parallelism knee at sf0.1 on
    BOTH 8 and 32 cores: widths {8,13,26} bracket the minimum on both,
    width 52 loses on both). At production scale the same formula keeps
    partitions ~constant-sized: 1M series → ~5.2k fit partitions,
    however wide the cluster."""
    import math
    import os

    per = int(os.environ.get("SPARK_GRAFT_SERIES_PER_PART", "192"))
    return max(1, math.ceil(int(n_series) / max(1, per)))


@dataclass
class SeriesForecaster:
    """Forecast every metric column of a wide daily table.

    Parameters mirror the reference CLI (forecast_script.py:254-257):
    interval = horizon days; only_future = emit strictly-future rows only.
    """

    interval: int
    only_future: bool = False
    backend: str = "auto"  # "prophet" | "fourier_ridge" | "auto"
    # Python-stage fan-out width. AQE's shuffle coalescing is BYTE-based:
    # a many-series long frame is only a few KB per series, so AQE happily
    # merges the whole fit stage into ONE partition — one python worker,
    # serial fits (measured: 32 groups of 1s compute = 33s wall before
    # this fix). The per-group cost here is model CPU, invisible to a
    # byte-based coalescer, so the operator pins its own width with an
    # explicit keyed repartition (which AQE respects). None = the
    # session's default parallelism at call time.
    fanout_partitions: int | None = None

    def transform_long(self, long_df: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
        """Forecast a long frame (ds, metric, y [, extra group cols]).

        Returns long (group..., metric, ds, yhat, yhat_lower, yhat_upper).

        Execution shape (r8 VERDICT task #1): ONE keyed repartition on the
        series key, then ``mapInPandas`` — each partition holds many whole
        series (the hash repartition guarantees no series straddles a
        partition) and the worker fits them BATCHED, sharing the design
        matrix / future axis / datetime parsing across every series on the
        same date axis (model.batched_fit_predict_long; bit-for-bit equal
        to the per-series path, pinned by test). vs the previous per-group
        applyInPandas this removes the per-series group-dispatch and pandas
        overhead (~6.6 ms/series — 10× the actual solve cost).

        Memory contract: one PARTITION of series must fit one worker
        (previously one series) — controlled by fanout_partitions; at
        cluster scale set it ∝ series count so partitions stay ~constant
        size, exactly how the shuffle-partition knob is already sized.
        """
        groups = (group_cols or []) + ["metric"]
        n_parts = self.fanout_partitions
        if n_parts is None:
            n_parts = long_df.sparkSession.sparkContext.defaultParallelism
        # keyed repartition on the group columns: co-locates each series'
        # rows in one partition for the batched fitter, and AQE does not
        # coalesce an explicit user repartition — the fit stage keeps
        # n_parts-wide parallelism regardless of byte size (the per-group
        # cost is model CPU, invisible to AQE's byte-based coalescer)
        long_df = long_df.repartition(n_parts, *groups)
        interval, only_fut, backend = self.interval, self.only_future, self.backend
        out_schema = (
            ", ".join(f"{c} string" for c in (group_cols or [])) + ", " if group_cols else ""
        ) + _LONG_OUT_SCHEMA

        def _fit_partition(batches):
            # a series may straddle ARROW BATCHES within the partition, so
            # concatenate first; the partition is the memory unit (see
            # docstring). Empty partitions yield nothing.
            chunks = list(batches)
            if not chunks:
                return
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            out = batched_fit_predict_long(
                pdf, groups, periods=interval, only_future=only_fut, backend=backend
            )
            if len(out):
                yield out

        return long_df.mapInPandas(_fit_partition, schema=out_schema)

    def watermarks(self, long_df: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
        """Per-series fit watermark: (group..., metric, last_max_ds). Persist
        this tiny frame alongside the forecast output to enable incremental
        refits — it is a partial-aggregated max, one row per series."""
        groups = (group_cols or []) + ["metric"]
        return long_df.groupBy(*groups).agg(F.max("ds").alias("last_max_ds"))

    def transform_long_incremental(
        self,
        long_df: DataFrame,
        prior_forecasts: DataFrame | None,
        prior_watermarks: DataFrame | None,
        group_cols: list[str] | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """Incremental refit: only series whose max(ds) advanced past their
        stored watermark are re-fitted; unchanged series reuse their prior
        forecast rows verbatim.

        The reference recomputes every table from scratch each run
        (forecast_script.py:127-132 drop + recreate); at 100 TB with mostly
        quiet series this makes cost proportional to CHANGE, not corpus:
        the stale-key set is a per-series aggregate (tiny — one row per
        series) broadcast into a semi-join on the raw data, so quiet series'
        history is pruned before it ever reaches a Python worker.

        Returns (forecasts, new_watermarks); pass new_watermarks back in on
        the next run. With prior_* = None everything is stale (first run).
        """
        groups = (group_cols or []) + ["metric"]
        current = self.watermarks(long_df, group_cols)
        if prior_forecasts is None or prior_watermarks is None:
            return self.transform_long(long_df, group_cols), current
        stale_keys = (
            current.withColumnRenamed("last_max_ds", "cur_max_ds")
            .join(prior_watermarks, groups, "left")
            .filter(
                F.col("last_max_ds").isNull()
                | (F.col("cur_max_ds") > F.col("last_max_ds"))
            )
            .select(*groups)
        )
        refreshed = self.transform_long(
            long_df.join(F.broadcast(stale_keys), groups, "left_semi"), group_cols
        )
        reused = prior_forecasts.join(F.broadcast(stale_keys), groups, "left_anti")
        return reused.unionByName(refreshed), current

    def backtest(
        self,
        long_df: DataFrame,
        cutoffs: list[str],
        group_cols: list[str] | None = None,
    ) -> DataFrame:
        """Rolling-origin evaluation: for every cutoff, fit on history
        <= cutoff, predict the next `interval` days, and score predictions
        against the held-out actuals.

        Spark-first shape (r9 VERDICT #3): ONE keyed repartition of the
        raw history; the cutoff axis fans out INSIDE the batched worker,
        which also scores against the co-located holdout actuals — a
        k-cutoff backtest shuffles the history ONCE (not k×) and emits
        only the (series × cutoff) metric rows, no prediction shuffle, no
        scoring join. A 10-cutoff backtest costs one extra in-worker pass
        per cutoff over already-local data.

        Returns one row per (group..., metric, cutoff): n_scored, mae,
        rmse, mape (zero-actual days excluded), and interval coverage
        (fraction of actuals inside [yhat_lower, yhat_upper]).
        """
        groups = (group_cols or []) + ["metric"]
        # ONE keyed repartition of the RAW history — the cutoff axis fans
        # out INSIDE the worker (r9 VERDICT #3). Each partition holds
        # whole series (the same hash repartition transform_long uses),
        # which means it also holds every cutoff's training prefix AND the
        # holdout actuals, so per cutoff the worker slices the prefix,
        # fits it through the SAME batched machinery (bit-for-bit equal to
        # the per-series reference path — the transform_long pin covers
        # it), and scores the predictions against the co-located actuals
        # in pandas. vs the previous plan (broadcast cutoff cross-join →
        # fit → shuffle preds → join actuals → aggregate) this removes the
        # k× train-row shuffle and the whole scoring join: shuffle volume
        # is now INDEPENDENT of the cutoff count — one pass of the history
        # in, one metrics row per (series, cutoff) out.
        #
        # NULL/NaN holdout actuals (never produced by this engine's
        # sources) are treated as missing: counted in n_scored (a row
        # existed), excluded from the error means. The previous plan-side
        # scoring treated SQL NULL the same way but let a literal NaN
        # poison the means (NaN > x is true in Spark SQL) — through Arrow
        # the NULL/NaN distinction does not survive, so the fused scorer
        # standardizes on the NULL semantics.
        n_parts = self.fanout_partitions
        if n_parts is None:
            n_parts = long_df.sparkSession.sparkContext.defaultParallelism
        part = long_df.repartition(n_parts, *groups)
        interval, backend = self.interval, self.backend
        cutoffs_str = [str(c) for c in cutoffs]
        out_schema = (
            ", ".join(f"{c} string" for c in groups)
            + ", cutoff string, n_scored bigint, mae double, rmse double,"
            " mape double, coverage double"
        )

        def _backtest_partition(batches):
            import numpy as np

            chunks = list(batches)
            if not chunks:
                return
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            ds_dt = pd.to_datetime(pdf["ds"])
            # r12 (guide §4.5 pattern): rewrite pdf's ds as the parsed
            # datetime64 ONCE — every per-cutoff batched_fit_predict_long
            # call re-runs pd.to_datetime over its slice (k parses of the
            # partition instead of 1); on already-datetime64 input that
            # inner parse is a no-op view. Values are identical by
            # construction (same parse), so fits are bit-for-bit.
            pdf = pdf.assign(ds=ds_dt)
            # Normalized-key actuals frame, built ONCE outside the cutoff
            # loop (ADVICE r10): predictions come back with datetime.date
            # ds (object dtype), so merging on a raw string-ds frame
            # silently matched nothing (zero metric rows) and a
            # timestamp-ds frame raised ValueError in the worker — the
            # pre-fusion Spark-side scoring join coerced both implicitly.
            # Both merge keys are normalized to datetime64 below.
            actuals = pdf[[*groups, "y"]].rename(columns={"y": "actual"})
            actuals = actuals.assign(ds=ds_dt)
            for cutoff in cutoffs_str:
                sub = pdf[ds_dt.values <= pd.Timestamp(cutoff).to_datetime64()]
                if not len(sub):
                    continue
                preds = batched_fit_predict_long(
                    sub, groups, periods=interval, only_future=True, backend=backend
                )
                if not len(preds):
                    continue
                merged = preds.assign(ds=pd.to_datetime(preds["ds"])).merge(
                    actuals, on=[*groups, "ds"], how="inner"
                )
                if not len(merged):
                    continue
                err = (merged["yhat"] - merged["actual"]).to_numpy()
                actual = merged["actual"].to_numpy(dtype="float64", na_value=np.nan)
                covered = (
                    (actual >= merged["yhat_lower"].to_numpy())
                    & (actual <= merged["yhat_upper"].to_numpy())
                ).astype("float64")
                # np.where evaluates both branches: silence the 0-actual
                # divide (those rows are masked out by the threshold)
                with np.errstate(divide="ignore", invalid="ignore"):
                    mape_term = np.where(
                        np.abs(actual) > 1e-9, np.abs(err / actual), np.nan
                    )
                g = merged.groupby(groups, sort=False, dropna=False)
                rows = []
                for key_vals, ix in g.indices.items():
                    if not isinstance(key_vals, tuple):
                        key_vals = (key_vals,)
                    e = err[ix]
                    ok = ~np.isnan(e)
                    mt = mape_term[ix]
                    mt_ok = ~np.isnan(mt)
                    rows.append(
                        (
                            *key_vals,
                            cutoff,
                            len(ix),
                            float(np.mean(np.abs(e[ok]))) if ok.any() else None,
                            float(np.sqrt(np.mean(e[ok] * e[ok]))) if ok.any() else None,
                            float(np.mean(mt[mt_ok])) if mt_ok.any() else None,
                            float(np.mean(covered[ix][ok])) if ok.any() else None,
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        *groups, "cutoff", "n_scored",
                        "mae", "rmse", "mape", "coverage",
                    ],
                )

        return part.mapInPandas(_backtest_partition, schema=out_schema).orderBy(
            *groups, "cutoff"
        )

    def transform(self, df: DataFrame, axis: str = DATE_AXIS_COLUMN) -> DataFrame:
        """Forecast a wide daily table -> wide forecast table
        (date, m, m_min, m_max per metric), the reference's per-table output
        (forecast_script.py:134-145 schema, :187-194 pivot)."""
        metrics = metric_columns(df.schema, axis=axis)
        if not metrics:
            raise ValueError("no forecastable metric columns")
        long_df = unpivot_metrics(
            df.withColumn(axis, F.to_date(F.col(axis))), metrics, axis=axis
        ).dropna(subset=["ds"])
        forecasts = self.transform_long(long_df)
        return pivot_forecasts_wide(forecasts, metrics)
