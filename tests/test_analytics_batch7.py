"""Semantic invariants for the batch-7 analytics queries (market-basket
lift, per-nation OLS trend, chi-square contingency, CUSUM breakpoints,
event trigrams, k-hop BFS reachability). Cross-engine value equality is
covered by the DuckDB oracle gate; these tests pin the math itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_market_basket_lift_is_exact_ppm(spark, sf_dir, qs):
    rows = qs["market_basket_pairs"](spark, sf_dir).collect()
    assert rows and len(rows) <= 50
    li = read_table(spark, sf_dir, "lineitem")
    n = li.select("l_orderkey").distinct().count()
    for r in rows:
        assert r.p1 < r.p2 and r.n12 >= 2
        # support can never exceed either item's count
        assert r.n12 <= min(r.n1, r.n2)
        # the ppm lift is the exact floor of the rational
        assert r.lift_ppm == (r.n12 * n * 1_000_000) // (r.n1 * r.n2)


def test_regression_trend_matches_numpy(spark, sf_dir, qs):
    import numpy as np

    rows = {r.n_name: r for r in qs["regression_trend_by_nation"](spark, sf_dir).collect()}
    assert len(rows) > 0
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            (
                (F.year(F.col("o_orderdate").cast("date")) - 1992) * 12
                + F.month(F.col("o_orderdate").cast("date"))
                - 1
            ).alias("x"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y"))
        .collect()
    )
    by_nation: dict[str, list] = {}
    for r in monthly:
        by_nation.setdefault(r.n_name, []).append((r.x, r.y))
    for name, pts in by_nation.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert rows[name].slope_cents_per_month == pytest.approx(slope, rel=1e-6, abs=1e-3)
        assert rows[name].intercept_cents == pytest.approx(intercept, rel=1e-6, abs=1e-2)


def test_chi_square_marginals_consistent(spark, sf_dir, qs):
    rows = qs["chi_square_segment_priority"](spark, sf_dir).collect()
    n_orders = read_table(spark, sf_dir, "orders").count()
    assert sum(r.obs for r in rows) == n_orders
    # expected values reproduce the observed marginals exactly
    assert sum(r.expected for r in rows) == pytest.approx(n_orders, rel=1e-9)
    for r in rows:
        assert r.chi2_contrib >= 0.0


def test_cusum_is_integer_exact_prefix_deviation(spark, sf_dir, qs):
    rows = qs["cusum_breakpoints"](spark, sf_dir).collect()
    assert len(rows) == 10
    o = read_table(spark, sf_dir, "orders")
    daily = sorted(
        (r.d, r.cents)
        for r in o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
        .collect()
    )
    n = len(daily)
    total = sum(c for _, c in daily)
    expected: dict = {}
    p = 0
    for i, (d, c) in enumerate(daily, start=1):
        p += c
        expected[d] = n * p - i * total
    got = {r.d: r.s_scaled for r in rows}
    for d, s in got.items():
        assert expected[d] == s
    # the query returns the 10 largest |S·n|
    top10 = sorted(expected.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:10]
    assert {d for d, _ in top10} == set(got)


def test_trigram_counts_sum_to_window_count(spark, sf_dir, qs):
    rows = qs["event_type_trigrams"](spark, sf_dir).collect()
    assert rows
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").count().collect()
    n_windows = sum(max(r["count"] - 2, 0) for r in per_user)
    assert sum(r.n for r in rows) <= n_windows
    assert all(r.trigram.count(">") == 2 for r in rows)
    # descending with trigram tie-break
    ks = [(-r.n, r.trigram) for r in rows]
    assert ks == sorted(ks)


def test_khop_bfs_matches_python_bfs(spark, sf_dir, qs):
    rows = qs["khop_nation_reachability"](spark, sf_dir).collect()
    dist = {r.node: r.dist for r in rows}
    src = [n for n, d in dist.items() if d == 0]
    assert len(src) == 1
    # distances are consistent: every node at dist k>0 has an in-neighbor
    # at k-1 -> verified by recomputing BFS over the same thresholded
    # edges with a plain Python queue
    from clickhouse_forecasting_spark.operators.graph import bfs_distances  # noqa: F401

    # rebuild edges exactly as the query does
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            )
            .cast("double")
            .alias("volume")
        )
        .collect()
    )
    mean_v = sum(r.volume for r in vol) / len(vol)
    edges: dict[int, list[int]] = {}
    for r in vol:
        if r.volume > 1.05 * mean_v:
            edges.setdefault(int(r.src), []).append(int(r.dst))
    from collections import deque

    start = src[0]
    py_dist = {start: 0}
    q = deque([start])
    while q:
        u = q.popleft()
        if py_dist[u] >= 4:
            continue
        for v in edges.get(u, []):
            if v not in py_dist:
                py_dist[v] = py_dist[u] + 1
                q.append(v)
    assert dist == py_dist
