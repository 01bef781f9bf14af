"""Semantic invariants for the batch-18 queries (activity islands,
contiguity DQ, discounted LTV). Cross-engine value equality is covered
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


def test_activity_islands_match_python(spark, sf_dir, qs):
    rows = qs["customer_activity_islands"](spark, sf_dir).collect()
    assert len(rows) == 20
    data = (
        read_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            (
                (F.year(F.col("o_orderdate").cast("date")) - 1992) * 12
                + F.month(F.col("o_orderdate").cast("date")) - 1
            ).alias("m"),
        )
        .distinct()
        .collect()
    )
    by_cust: dict[int, list[int]] = {}
    for r in data:
        by_cust.setdefault(r.o_custkey, []).append(r.m)
    stats = {}
    for cust, ms in by_cust.items():
        ms.sort()
        runs, cur = [], 1
        for a, b in zip(ms, ms[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        stats[cust] = (max(runs), len(runs))
    expected = sorted(
        ((-(v[0]), v[1], k) for k, v in stats.items())
    )[:20]
    got = [(-(r.longest_streak), r.n_islands, r.o_custkey) for r in rows]
    assert got == expected


def test_contiguity_holds_on_fixture(spark, sf_dir, qs):
    row = qs["lineitem_contiguity_check"](spark, sf_dir).collect()[0]
    n_orders = (
        read_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    assert row.n_orders == n_orders
    assert row.n_contiguous + row.n_violations == n_orders
    # python replay of the 1..k identity (the fixture generator draws
    # random line numbers, so violations are expected and exact)
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    by_order: dict[int, list[int]] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, []).append(r.l_linenumber)
    n_ok = sum(
        1
        for nums in by_order.values()
        if min(nums) == 1
        and max(nums) == len(nums)
        and sum(nums) == len(nums) * (len(nums) + 1) // 2
    )
    assert row.n_contiguous == n_ok


def test_discounted_ltv_matches_python(spark, sf_dir, qs):
    rows = qs["discounted_ltv_top_customers"](spark, sf_dir).collect()
    assert len(rows) == 20
    yearly = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.year(F.col("o_orderdate").cast("date")).alias("yr"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
        .collect()
    )
    by_cust: dict[int, list] = {}
    for r in yearly:
        by_cust.setdefault(r.o_custkey, []).append((r.yr, r.cents))
    w = {0: 1.0, 1: 0.9, 2: 0.81, 3: 0.729, 4: 0.6561, 5: 0.59049, 6: 0.531441}
    ltv = {}
    for cust, pts in by_cust.items():
        y0 = min(y for y, _ in pts)
        ltv[cust] = sum(c * w[y - y0] for y, c in pts)
    for r in rows:
        assert r.ltv_cents == pytest.approx(ltv[r.o_custkey], abs=0.02)
    # returned set is the true top-20 (ties broken by custkey)
    expected = sorted(((-v, k) for k, v in ltv.items()))[:20]
    got_keys = [r.o_custkey for r in rows]
    assert got_keys == [k for _, k in expected]
