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

        Spark-first shape: the cutoff is just another GROUP KEY — the
        training sets for all cutoffs are unioned (each tagged with its
        cutoff) and every (cutoff x series) fit is one applyInPandas task
        in a single job, so a 10-cutoff backtest parallelizes exactly like
        a 10x-larger corpus instead of running 10 sequential jobs.

        Returns one row per (group..., metric, cutoff): n_scored, mae,
        rmse, mape (zero-actual days excluded), and interval coverage
        (fraction of actuals inside [yhat_lower, yhat_upper]).
        """
        groups = (group_cols or []) + ["metric"]
        # ONE scan of the history: the cutoff axis rides a broadcast
        # cross-join + filter instead of a union of k filtered scans
        # (k scans = k× source/task-launch overhead; the row multiplication
        # is identical either way and the fit stage is unchanged)
        spark = long_df.sparkSession
        cuts = spark.createDataFrame(
            [(str(c),) for c in cutoffs], "cutoff string"
        )
        train = long_df.crossJoin(F.broadcast(cuts)).filter(
            F.col("ds") <= F.col("cutoff")
        )
        scorer = SeriesForecaster(
            interval=self.interval, only_future=True, backend=self.backend
        )
        preds = scorer.transform_long(
            train, group_cols=(group_cols or []) + ["cutoff"]
        )
        actual = long_df.select(*groups, "ds", F.col("y").alias("actual"))
        err = F.col("yhat") - F.col("actual")
        covered = (
            (F.col("actual") >= F.col("yhat_lower"))
            & (F.col("actual") <= F.col("yhat_upper"))
        ).cast("double")
        return (
            preds.join(actual, [*groups, "ds"])
            .groupBy(*groups, "cutoff")
            .agg(
                F.count("*").alias("n_scored"),
                F.avg(F.abs(err)).alias("mae"),
                F.sqrt(F.avg(err * err)).alias("rmse"),
                F.avg(
                    F.when(
                        F.abs(F.col("actual")) > 1e-9,
                        F.abs(err / F.col("actual")),
                    )
                ).alias("mape"),
                F.avg(covered).alias("coverage"),
            )
            .orderBy(*groups, "cutoff")
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
