"""Per-table orchestration — the engine's equivalent of the reference main().

Reproduces the observable run semantics of forecast_script.py:220-247:
enumerate tables (or take an explicit list), skip derived
``bucket_forecast_*`` tables, derive the output schema from the type filter,
drop+recreate the forecast table, fit+predict every metric, sink wide rows
keyed by date, and log a run summary.

Differences by design (all documented in SURVEY §7.5 / §2.5):
- tables are processed through Spark, so each table's (metric-count) series
  fit in parallel; independent tables can ALSO run concurrently via
  ``max_concurrent`` (r7 VERDICT #7) — each table is submitted from its own
  thread under its own Spark job group, so the cluster stays busy between
  small tables instead of idling through a sequential driver loop;
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


def _process_table(
    catalog: ParquetCatalog, forecaster: SeriesForecaster, table: str
) -> dict:
    """One table through the full reference flow; returns a result record
    the caller folds into RunCounters IN INPUT ORDER (so counters and the
    summary line are deterministic even when tables run concurrently).

    status: skipped | failed | ok;  ok carries existed + failed_metrics."""
    if is_forecast_output(table):  # R14 (forecast_script.py:234-236)
        return {"table": table, "status": "skipped"}

    logger.info("processing table %s", table)
    if not catalog.table_exists(table):
        logger.warning("table %s does not exist", table)
        return {"table": table, "status": "failed"}
    df = catalog.table(table)
    if DATE_AXIS_COLUMN not in df.columns:
        # input contract: a `date` axis column is required (README.md:33)
        logger.warning("table %s has no '%s' column", table, DATE_AXIS_COLUMN)
        return {"table": table, "status": "failed"}
    for name, typ in skipped_columns(df.schema):
        logger.info("skipping column with non-forecastable type: %s: %s", name, typ)
    metrics = metric_columns(df.schema)
    out_name = forecast_table_name(table)
    existed = catalog.table_exists(out_name)

    if not metrics:
        logger.warning("no forecastable columns in %s", table)
        return {"table": table, "status": "failed"}
    if df.select(DATE_AXIS_COLUMN).isEmpty():  # R3 (forecast_script.py:160-163)
        logger.warning("missing data in %s", table)
        return {"table": table, "status": "failed"}

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
        logger.error("series failed for %s: %s", table, failed_metrics)

    logger.info("wrote %s", out_name)
    return {
        "table": table,
        "status": "ok",
        "existed": existed,
        "failed_metrics": failed_metrics,
    }


def run_forecast_pipeline(
    catalog: ParquetCatalog,
    interval: int,
    specific_tables: list[str] | None = None,
    only_future: bool = False,
    backend: str = "auto",
    max_concurrent: int = 1,
    release_caches: bool = False,
) -> RunCounters:
    """``max_concurrent`` > 1 submits that many tables at once, each from
    its own thread under its own Spark job group (Spark job submission is
    thread-safe; local properties are thread-scoped, so cancellation and
    the UI stay per-table). Results fold into the counters in INPUT
    order, so counter contents and the summary line match the sequential
    run exactly — only wall-clock changes. Table-level log lines may
    interleave across tables under concurrency.

    ``release_caches=True`` drops every ``runtime_cache`` entry keyed by a
    table's name as that table finishes — the unpersist-after-consume hook
    for long-lived sessions whose operators registered per-table stages
    (r9 VERDICT #6). Default off: a session that re-runs tables (bench
    iterations, incremental refits) wants the cache hits."""
    counters = RunCounters()
    tables = specific_tables if specific_tables else catalog.list_tables()
    forecaster = SeriesForecaster(interval=interval, only_future=only_future, backend=backend)

    def _maybe_release(table: str) -> None:
        if release_caches:
            from . import runtime_cache

            n = runtime_cache.release(table)
            if n:
                logger.info("released %d cached stage(s) for %s", n, table)

    # R15 exact-membership selection happens in the `tables` assignment
    # above (the reference's substring-membership quirk at :231 is a
    # documented deviation — we take the explicit list as-is)
    if int(max_concurrent) > 1 and len(tables) > 1:
        from concurrent.futures import ThreadPoolExecutor

        sc = catalog.spark.sparkContext

        def _run(table: str) -> dict:
            sc.setJobGroup(
                f"forecast:{table}", f"forecast pipeline table {table}"
            )
            try:
                return _process_table(catalog, forecaster, table)
            finally:
                sc.setJobGroup("", "")
                _maybe_release(table)

        with ThreadPoolExecutor(max_workers=int(max_concurrent)) as pool:
            results = list(pool.map(_run, tables))
    else:
        results = []
        for t in tables:
            results.append(_process_table(catalog, forecaster, t))
            _maybe_release(t)

    for r in results:
        if r["status"] == "skipped":
            counters.skipped.append(r["table"])
        elif r["status"] == "failed":
            counters.failed.append(r["table"])
        else:
            if r["failed_metrics"]:
                counters.failed_metrics[r["table"]] = r["failed_metrics"]
            (counters.updated if r["existed"] else counters.new).append(r["table"])
            counters.successful.append(r["table"])

    logger.info(counters.summary())
    return counters
