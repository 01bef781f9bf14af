"""Semantic invariants for the batch-22 query (boxplot stats).
Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


def test_boxplot_matches_python(spark, sf_dir):
    qs = entry.queries()
    rows = {r.n_name: r for r in qs["boxplot_stats_by_nation"](spark, sf_dir).collect()}
    assert rows
    base = (
        read_table(spark, sf_dir, "orders")
        .join(read_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(read_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_nation: dict[str, list[int]] = {}
    for r in base:
        by_nation.setdefault(r.n_name, []).append(r.cents)
    for name, xs in by_nation.items():
        xs.sort()
        n = len(xs)
        q1 = xs[math.ceil(n * 25 / 100) - 1]
        q2 = xs[math.ceil(n * 50 / 100) - 1]
        q3 = xs[math.ceil(n * 75 / 100) - 1]
        iqr = q3 - q1
        lo = sum(1 for x in xs if 2 * x < 2 * q1 - 3 * iqr)
        hi = sum(1 for x in xs if 2 * x > 2 * q3 + 3 * iqr)
        r = rows[name]
        assert (r.n, r.q1, r.q2, r.q3, r.iqr) == (n, q1, q2, q3, iqr)
        assert (r.n_low_outliers, r.n_high_outliers) == (lo, hi)
        assert r.q1 <= r.q2 <= r.q3
