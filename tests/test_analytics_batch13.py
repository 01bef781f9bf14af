"""Semantic invariants for the batch-13 robust-statistics queries
(Theil-Sen trend, inter-purchase histogram, Fano factor, winsorized
mean). Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_theilsen_matches_python_median_of_slopes(spark, sf_dir, qs):
    got = {r.n_name: r for r in qs["theilsen_trend_by_nation"](spark, sf_dir).collect()}
    assert got
    monthly = (
        read_table(spark, sf_dir, "orders")
        .join(read_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(read_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            (
                (F.year(F.col("o_orderdate").cast("date")) - 1992) * 12
                + F.month(F.col("o_orderdate").cast("date")) - 1
            ).alias("x"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in monthly:
        series.setdefault(r.n_name, []).append((r.x, r.y))
    for name, pts in series.items():
        pts.sort()
        slopes = sorted(
            (
                ((y2 - y1) / (x2 - x1), x1, x2)
                for i, (x1, y1) in enumerate(pts)
                for (x2, y2) in pts[i + 1 :]
            )
        )
        lower_median = slopes[(len(slopes) + 1) // 2 - 1][0]
        assert got[name].cnt == len(slopes)
        assert got[name].theilsen_slope == pytest.approx(lower_median, abs=2e-6)


def test_interpurchase_histogram_totals(spark, sf_dir, qs):
    rows = qs["interpurchase_time_histogram"](spark, sf_dir).collect()
    assert rows
    o = read_table(spark, sf_dir, "orders")
    n_orders = o.count()
    n_customers = o.select("o_custkey").distinct().count()
    # one gap per order beyond each customer's first
    assert sum(r.n_gaps for r in rows) == n_orders - n_customers
    assert all(0 <= r.week_bucket <= 52 for r in rows)


def test_fano_factor_matches_numpy(spark, sf_dir, qs):
    import numpy as np

    got = {r.event_type: r for r in qs["fano_factor_event_types"](spark, sf_dir).collect()}
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("k"))
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r.k)
    for t, ks in series.items():
        a = np.array(ks, dtype=float)
        fano = a.var() / a.mean()
        assert got[t].fano_factor == pytest.approx(fano, abs=2e-6)
        assert got[t].n_days == len(ks) and got[t].sk == sum(ks)


def test_winsorized_mean_bounds_and_python_twin(spark, sf_dir, qs):
    import math

    got = {r.seg: r for r in qs["winsorized_mean_by_segment"](spark, sf_dir).collect()}
    base = (
        read_table(spark, sf_dir, "orders")
        .join(read_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_seg: dict[str, list[int]] = {}
    for r in base:
        by_seg.setdefault(r.seg, []).append(r.cents)
    for seg, xs in by_seg.items():
        xs.sort()
        n = len(xs)
        lo = xs[math.ceil(n * 5 / 100) - 1]
        hi = xs[math.ceil(n * 95 / 100) - 1]
        wm = sum(min(hi, max(lo, x)) for x in xs) / n
        r = got[seg]
        assert r.n == n
        assert r.winsorized_mean_cents == pytest.approx(wm, abs=0.02)
        assert lo <= r.winsorized_mean_cents <= hi
