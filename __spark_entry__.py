"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query: distributed forecast of the daily sales
                series derived from orders at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 + the
                BASELINE.json extension surface (see
                clickhouse_forecasting_spark/queries/).
oracle_sql()  — DuckDB twins for everything SQL-expressible; forecast /
                LSH-ANN / Pandas-UDF-decode entries are rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_forecasting_spark.queries import ORACLE_QUERIES, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: forecast 7 days of daily order count + revenue at sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return SPARK_QUERIES["forecast_daily_sales"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _with_utc(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return wrapped

    return {name: _with_utc(fn) for name, fn in SPARK_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_QUERIES)
