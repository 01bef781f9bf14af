"""Per-table orchestration — the engine's equivalent of the reference main().

Reproduces the observable run semantics of forecast_script.py:220-247:
enumerate tables (or take an explicit list), skip derived
``bucket_forecast_*`` tables, derive the output schema from the type filter,
drop+recreate the forecast table, fit+predict every metric, sink wide rows
keyed by date, and log a run summary.

Differences by design (all documented in SURVEY §7.5 / §2.5):
- tables are processed through Spark, so each table's (metric-count) series
  fit in parallel; tables themselves can also be submitted concurrently by a
  caller since jobs are independent;
- the non-``bucket_`` naming crash of the reference (:156) is fixed — the
  C6 rule (catalog.forecast_table_name) is used everywhere;
- counters are disjoint; failed metrics are reported per table.
"""

from __future__ import annotations

import logging

from pyspark.sql import functions as F

from .catalog import ParquetCatalog, forecast_table_name, is_forecast_output
from .forecast import SeriesForecaster
from .relational import ordered_for_sink
from .schema import DATE_AXIS_COLUMN, metric_columns, skipped_columns
from .telemetry import RunCounters

logger = logging.getLogger("clickhouse_forecasting_spark")


def run_forecast_pipeline(
    catalog: ParquetCatalog,
    interval: int,
    specific_tables: list[str] | None = None,
    only_future: bool = False,
    backend: str = "auto",
) -> RunCounters:
    counters = RunCounters()
    tables = specific_tables if specific_tables else catalog.list_tables()
    forecaster = SeriesForecaster(interval=interval, only_future=only_future, backend=backend)

    # R15 exact-membership selection happens in the `tables` assignment
    # above (the reference's substring-membership quirk at :231 is a
    # documented deviation — we take the explicit list as-is)
    for table in tables:
        if is_forecast_output(table):  # R14 (forecast_script.py:234-236)
            counters.skipped.append(table)
            continue

        logger.info("processing table %s", table)
        if not catalog.table_exists(table):
            logger.warning("table %s does not exist", table)
            counters.failed.append(table)
            continue
        df = catalog.table(table)
        if DATE_AXIS_COLUMN not in df.columns:
            # input contract: a `date` axis column is required (README.md:33)
            logger.warning("table %s has no '%s' column", table, DATE_AXIS_COLUMN)
            counters.failed.append(table)
            continue
        for name, typ in skipped_columns(df.schema):
            logger.info("skipping column with non-forecastable type: %s: %s", name, typ)
        metrics = metric_columns(df.schema)
        out_name = forecast_table_name(table)
        existed = catalog.table_exists(out_name)

        if not metrics:
            logger.warning("no forecastable columns in %s", table)
            counters.failed.append(table)
            continue
        if df.select(DATE_AXIS_COLUMN).isEmpty():  # R3 (forecast_script.py:160-163)
            logger.warning("missing data in %s", table)
            counters.failed.append(table)
            continue

        wide = forecaster.transform(df)
        catalog.write_table(ordered_for_sink(wide, metrics), out_name, order_by=DATE_AXIS_COLUMN)

        # M4 surfacing: metrics whose series failed have all-NULL value columns
        null_counts = (
            catalog.table(out_name)
            .agg(*[F.count(m).alias(m) for m in metrics])
            .collect()[0]
            .asDict()
        )
        failed_metrics = [m for m, n in null_counts.items() if n == 0]
        if failed_metrics:
            counters.failed_metrics[table] = failed_metrics
            logger.error("series failed for %s: %s", table, failed_metrics)

        (counters.updated if existed else counters.new).append(table)
        counters.successful.append(table)
        logger.info("wrote %s", out_name)

    logger.info(counters.summary())
    return counters
