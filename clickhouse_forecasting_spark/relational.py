"""Relational operators R1-R13 (SURVEY §2.2) as DataFrame combinators.

Each function is a thin, declarative combinator — the point is to hand
Catalyst a logical plan it can optimize (projection pruning into the parquet
scan, predicate pushdown, broadcast joins for small frames), never to
hand-schedule execution. Reference line citations point at the semantics
being reproduced, not code being translated.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import DATE_AXIS_COLUMN


# R1 — scan + projection + sort (forecast_script.py:157-158).
# Catalyst pushes the projection into the parquet scan (ReadSchema); the
# global sort is usually unnecessary (per-group sort happens inside the
# forecaster), so callers should pass sort=False in the distributed path —
# a 100 TB global sort is a full range-shuffle we never need for modeling.
def scan_metrics(df: DataFrame, metrics: list[str], axis: str = DATE_AXIS_COLUMN, sort: bool = True) -> DataFrame:
    out = df.select(axis, *metrics)
    return out.orderBy(axis) if sort else out


# R3 — empty-input guard (forecast_script.py:160-163)
def is_empty(df: DataFrame) -> bool:
    return df.isEmpty()


# R4 — cast-to-date with coerce-on-error semantics (forecast_script.py:165,181):
# try_to_date yields NULL for unparseable input, matching pandas
# errors='coerce' (plain to_date throws under Spark 4's default ANSI mode).
def cast_axis_to_date(df: DataFrame, axis: str = DATE_AXIS_COLUMN) -> DataFrame:
    return df.withColumn(axis, F.try_to_date(F.col(axis)))


# R5 — max aggregate (forecast_script.py:166). One-row driver fetch; at scale
# this is parquet-stat-answerable (aggregate pushdown reads footers only).
def last_known_date(df: DataFrame, axis: str = DATE_AXIS_COLUMN):
    return df.agg(F.max(axis).alias("last_known_date")).collect()[0][0]


# R6 — wide -> long model frame. Single metric = rename (forecast_script.py:172);
# all metrics at once = unpivot, the spine of the distributed design
# (SURVEY §7.1): one shuffle by (metric) replaces the reference's column loop.
def to_model_frame(df: DataFrame, metric: str, axis: str = DATE_AXIS_COLUMN) -> DataFrame:
    return df.select(F.col(axis).alias("ds"), F.col(metric).cast("double").alias("y"))


def unpivot_metrics(df: DataFrame, metrics: list[str], axis: str = DATE_AXIS_COLUMN) -> DataFrame:
    """Wide table -> long (ds, metric, y). Uses the built-in unpivot
    (Spark 3.4+) so values never pass through Python."""
    casted = df.select(F.col(axis).alias("ds"), *[F.col(m).cast("double").alias(m) for m in metrics])
    return casted.unpivot("ds", metrics, "metric", "y")


# R7 — date-axis generation (forecast_script.py:174, make_future_dataframe):
# observed history dates ∪ a generated daily future axis of `periods` days.
def future_date_axis(df: DataFrame, periods: int, axis: str = DATE_AXIS_COLUMN) -> DataFrame:
    """Distinct observed dates plus `periods` generated days after max(date).
    sequence+explode generates on the executors; no driver loop."""
    history = df.select(F.col(axis).alias("ds")).distinct()
    future = df.agg(F.max(axis).alias("d0")).select(
        F.explode(
            F.sequence(
                F.date_add(F.col("d0"), 1),
                F.date_add(F.col("d0"), periods),
                F.expr("interval 1 day"),
            )
        ).alias("ds")
    )
    return history.unionByName(future)


# R8 — strictly-after range filter (--only-future, forecast_script.py:175-176)
def only_future(df: DataFrame, last_date, ds_col: str = "ds") -> DataFrame:
    return df.filter(F.col(ds_col) > F.lit(last_date))


# R10 — derived interval columns (forecast_script.py:183-185)
def derive_bounds(df: DataFrame, metric: str) -> DataFrame:
    return df.select(
        F.col("ds"),
        F.col("yhat").alias(metric),
        F.col("yhat_lower").alias(f"{metric}_min"),
        F.col("yhat_upper").alias(f"{metric}_max"),
    )


# R11/R12 — k-way full outer join on the date axis with NULL fill
# (forecast_script.py:168,187-194,207-211). Two strategies:
#   pivot: one shuffle, best when the metric list is known (it is, from R2)
#   reduce-outer-join: for very wide tables where pivot's column explosion
#                      in a single stage is worse than k joins
def pivot_forecasts_wide(long_df: DataFrame, metrics: list[str]) -> DataFrame:
    """long (ds, metric, yhat, yhat_lower, yhat_upper) -> wide
    (date, m, m_min, m_max ...). Explicit pivot value list avoids the extra
    distinct scan Spark otherwise runs to discover pivot keys."""
    wide = (
        long_df.groupBy("ds")
        .pivot("metric", metrics)
        .agg(
            F.first("yhat").alias("v"),
            F.first("yhat_lower").alias("min"),
            F.first("yhat_upper").alias("max"),
        )
    )
    cols = [F.col("ds").alias(DATE_AXIS_COLUMN)]
    for m in metrics:
        # single-metric pivot drops the prefix; normalize both cases
        v, lo, hi = (f"{m}_v", f"{m}_min", f"{m}_max") if f"{m}_v" in wide.columns else ("v", "min", "max")
        cols += [F.col(v).alias(m), F.col(lo).alias(f"{m}_min"), F.col(hi).alias(f"{m}_max")]
    return wide.select(*cols)


def outer_join_on_date(frames: list[DataFrame], key: str = "ds") -> DataFrame:
    """k-way FULL OUTER JOIN on the date axis; absent cells stay NULL (R12)."""
    return reduce(lambda a, b: a.join(b, key, "full_outer"), frames)


# R13 — ordered sink projection: date, all cols, all _min, all _max
# (forecast_script.py:204). The reference's INSERT column order.
def sink_column_order(metrics: list[str], axis: str = DATE_AXIS_COLUMN) -> list[str]:
    return [axis, *metrics, *[f"{m}_min" for m in metrics], *[f"{m}_max" for m in metrics]]


def ordered_for_sink(df: DataFrame, metrics: list[str], axis: str = DATE_AXIS_COLUMN) -> DataFrame:
    return df.select(*sink_column_order(metrics, axis))


# Bonus combinator used by extension queries: strictly-typed daily rollup of a
# timestamp-keyed fact table into a forecast-shaped wide table.
def daily_rollup(df: DataFrame, ts_col: str, aggs: list[Column]) -> DataFrame:
    return (
        df.withColumn(DATE_AXIS_COLUMN, F.to_date(F.col(ts_col)))
        .groupBy(DATE_AXIS_COLUMN)
        .agg(*aggs)
    )


def date_spine(df: DataFrame, axis: str = DATE_AXIS_COLUMN) -> DataFrame:
    """Complete daily axis min(date)..max(date) — sequence+explode on the
    executors (one 2-value aggregate feeds it; no driver loop)."""
    return df.agg(F.min(axis).alias("d0"), F.max(axis).alias("d1")).select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias(axis)
    )


def gap_fill(
    df: DataFrame,
    value_cols: list[str],
    axis: str = DATE_AXIS_COLUMN,
    method: str = "interpolate",
) -> DataFrame:
    """Fill missing dates of a daily series: join against the full date
    spine, then per value column either carry the last observation forward
    (``method='ffill'``) or linearly interpolate between the neighboring
    observations (``method='interpolate'``; trailing/leading gaps fall back
    to the nearest observed value).

    A time-series store's gap-filling operator (ClickHouse's WITH FILL /
    timescale's time_bucket_gapfill). All window passes share ONE
    range-shuffle on the axis; at 100 TB partition the window by a coarse
    date bucket (year) to bound task state."""
    from pyspark.sql import Window

    spine = date_spine(df, axis)
    joined = spine.join(df, axis, "left").withColumn(
        "_day", F.datediff(F.col(axis), F.lit("1970-01-01"))
    )
    w = Window.orderBy(axis)
    wprev = w.rowsBetween(Window.unboundedPreceding, 0)
    wnext = w.rowsBetween(0, Window.unboundedFollowing)
    out = joined
    for c in value_cols:
        prev_v = F.last(c, ignorenulls=True).over(wprev)
        if method == "ffill":
            out = out.withColumn(c, F.coalesce(F.col(c), prev_v))
            continue
        next_v = F.first(c, ignorenulls=True).over(wnext)
        prev_d = F.last(
            F.when(F.col(c).isNotNull(), F.col("_day")), ignorenulls=True
        ).over(wprev)
        next_d = F.first(
            F.when(F.col(c).isNotNull(), F.col("_day")), ignorenulls=True
        ).over(wnext)
        interp = prev_v + (next_v - prev_v) * (F.col("_day") - prev_d) / (next_d - prev_d)
        out = out.withColumn(
            c,
            F.coalesce(F.col(c), interp, prev_v, next_v),
        )
    return out.drop("_day")
