"""Semantic invariants for the batch-9 statistics queries (Gini, ACF,
survival hazard, runs test). Cross-engine value equality is covered by
the DuckDB oracle gate; these pin the math against independent
reimplementations (numpy / plain Python).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


@pytest.fixture(scope="module")
def daily_cents(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x"))
        .orderBy("d")
        .collect()
    )
    return [r.x for r in rows]


def test_gini_matches_reference_formula(spark, sf_dir, qs):
    got = {r.n_name: r for r in qs["gini_revenue_by_nation"](spark, sf_dir).collect()}
    assert got
    per = (
        read_table(spark, sf_dir, "orders")
        .join(read_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(read_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
        .collect()
    )
    by_nation: dict[str, list[int]] = {}
    for r in per:
        by_nation.setdefault(r.n_name, []).append(r.cents)
    for name, xs in by_nation.items():
        xs = sorted(xs)
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * six - (n + 1) * sx) / (n * sx)
        assert got[name].gini == pytest.approx(gini, abs=2e-6)
        assert 0.0 <= got[name].gini < 1.0


def test_acf_matches_numpy_pearson(spark, sf_dir, qs, daily_cents):
    import numpy as np

    got = {r.k: r for r in qs["acf_daily_revenue"](spark, sf_dir).collect()}
    assert set(got) == set(range(1, 15))
    x = np.array(daily_cents, dtype=float)
    for k in range(1, 15):
        a, b = x[:-k], x[k:]
        assert got[k].n == len(a)
        r = np.corrcoef(a, b)[0, 1]
        assert got[k].acf == pytest.approx(r, abs=2e-6)
        assert -1.0 <= got[k].acf <= 1.0


def test_survival_hazard_curve_invariants(spark, sf_dir, qs):
    rows = sorted(qs["survival_hazard_curve"](spark, sf_dir).collect(), key=lambda r: r.t)
    assert rows
    ev = read_table(spark, sf_dir, "events")
    n_signup = (
        ev.filter(F.col("event_type") == "signup").select("user_id").distinct().count()
    )
    # n_risk never exceeds the signup cohort and never increases over t
    prev = n_signup
    for r in rows:
        assert 1 <= r.d_events <= r.n_risk <= n_signup
        assert r.n_risk <= prev
        prev = r.n_risk
        assert r.hazard_ppm == (r.d_events * 1_000_000) // r.n_risk
    # total conversions equal users with a purchase at/after their signup
    total_conv = sum(r.d_events for r in rows)
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    conv = (
        signup.join(purch, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert total_conv == conv


def test_runs_test_matches_python_scan(spark, sf_dir, qs, daily_cents):
    row = qs["runs_test_daily"](spark, sf_dir).collect()[0]
    signs = []
    for a, b in zip(daily_cents, daily_cents[1:]):
        if b != a:
            signs.append(1 if b > a else -1)
    n_pos = signs.count(1)
    n_neg = signs.count(-1)
    n_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert (row.n_pos, row.n_neg, row.n_runs) == (n_pos, n_neg, n_runs)
    mu = 1 + 2 * n_pos * n_neg / (n_pos + n_neg)
    var = (
        2 * n_pos * n_neg * (2 * n_pos * n_neg - n_pos - n_neg)
        / ((n_pos + n_neg) ** 2 * (n_pos + n_neg - 1))
    )
    assert row.z_score == pytest.approx((n_runs - mu) / var**0.5, abs=2e-6)
