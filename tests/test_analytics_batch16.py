"""Semantic invariants for the batch-16 metrics-layer queries (daily KPI
spine, hierarchical share report). Cross-engine value equality is covered
by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_daily_kpi_consistency(spark, sf_dir, qs):
    rows = sorted(qs["daily_kpi_wide"](spark, sf_dir).collect(), key=lambda r: r.d)
    assert rows
    o = read_table(spark, sf_dir, "orders")
    n_orders = o.count()
    n_customers = o.select("o_custkey").distinct().count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert sum(r.n_new_buyers for r in rows) == n_customers
    # cumulative buyers ends at the full base and never decreases
    assert rows[-1].cum_buyers == n_customers
    prev = 0
    for r in rows:
        assert r.cum_buyers >= prev
        prev = r.cum_buyers
        assert r.n_new_buyers <= r.n_buyers <= r.n_orders
        assert r.aov_cents == r.rev_cents // r.n_orders


def test_hierarchy_shares_sum_to_unity(spark, sf_dir, qs):
    rows = qs["hierarchy_share_report"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    region_ppm = defaultdict(int)
    region_share = {}
    for r in rows:
        region_ppm[r.r_name] += r.share_of_region_ppm
        region_share[r.r_name] = r.region_share_ppm
    # floor-division shares sum to 1e6 minus at most (members-1) ppm
    per_region_counts = defaultdict(int)
    for r in rows:
        per_region_counts[r.r_name] += 1
    for region, total in region_ppm.items():
        k = per_region_counts[region]
        assert 1_000_000 - (k - 1) <= total <= 1_000_000
    world = 0
    seen = set()
    for r in rows:
        if r.r_name not in seen:
            seen.add(r.r_name)
            world += region_share[r.r_name]
    assert 1_000_000 - (len(seen) - 1) <= world <= 1_000_000
