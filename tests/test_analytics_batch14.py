"""Semantic invariants for the batch-14 operational-interval queries
(ship-delay SLA percentiles, peak open orders, Lorenz curve points).
Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_ship_delay_percentiles_match_python(spark, sf_dir, qs):
    rows = qs["ship_delay_percentiles"](spark, sf_dir).collect()
    delays = (
        read_table(spark, sf_dir, "lineitem")
        .join(read_table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("delay"),
        )
        .collect()
    )
    by_pri: dict[str, list[int]] = {}
    for r in delays:
        by_pri.setdefault(r.o_orderpriority, []).append(r.delay)
    for r in rows:
        xs = sorted(by_pri[r.pri])
        assert r.delay_days == xs[math.ceil(r.q * len(xs) / 100) - 1]
        assert r.delay_days >= 0
    by = {}
    for r in rows:
        by.setdefault(r.pri, {})[r.q] = r.delay_days
    for d in by.values():
        assert d[50] <= d[90] <= d[99]


def test_peak_open_orders_matches_python_sweep(spark, sf_dir, qs):
    rows = qs["peak_open_orders"](spark, sf_dir).collect()
    assert len(rows) == 10
    spans = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("close_d"))
        .join(read_table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_orderdate").cast("date").alias("open_d"), "close_d")
        .collect()
    )
    from collections import defaultdict
    from datetime import timedelta

    net = defaultdict(int)
    for r in spans:
        net[r.open_d] += 1
        net[r.close_d + timedelta(days=1)] -= 1
    run, sweep = 0, {}
    for d in sorted(net):
        run += net[d]
        sweep[d] = run
    top10 = sorted(sweep.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.d, r.open_orders) for r in rows] == top10
    # sweep conservation: final running sum is zero
    assert run == 0


def test_lorenz_points_monotone_and_convex(spark, sf_dir, qs):
    rows = qs["lorenz_curve_points"](spark, sf_dir).collect()
    assert rows
    by_region: dict[str, dict[int, int]] = {}
    for r in rows:
        by_region.setdefault(r.r_name, {})[r.decile] = r.cum_share_ppm
    for region, pts in by_region.items():
        assert max(pts) == 10
        # the 100% point holds (floor division can land at 999999)
        assert pts[10] >= 999_999 - 1
        seq = [pts[k] for k in sorted(pts)]
        # monotone increasing
        assert all(a <= b for a, b in zip(seq, seq[1:]))
        # Lorenz curve lies below the diagonal: share at decile k <= k/10
        for k, share in pts.items():
            assert share <= k * 100_000 + 1
