"""Semantic invariants for the batch-23 queries (conversion curve,
monthly HHI). Cross-engine value equality is covered by the DuckDB
oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_conversion_curve_monotone_and_consistent(spark, sf_dir, qs):
    rows = {r.t_mark: r for r in qs["conversion_curve"](spark, sf_dir).collect()}
    assert set(rows) == {1, 7, 14, 30}
    ev = read_table(spark, sf_dir, "events")
    n_cohort = (
        ev.filter(F.col("event_type") == "signup").select("user_id").distinct().count()
    )
    prev = -1
    for t in [1, 7, 14, 30]:
        r = rows[t]
        assert r.n_cohort == n_cohort
        assert r.conv_ppm == (r.n_converted * 1_000_000) // r.n_cohort
        # cumulative: converting within a longer window is never rarer
        assert r.n_converted >= prev
        prev = r.n_converted
    # the 30-day mark is bounded by total ever-converters
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    ever = (
        signup.join(purch, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[30].n_converted <= ever


def test_hhi_bounds_and_python_twin(spark, sf_dir, qs):
    rows = {r.mo: r for r in qs["monthly_hhi_nations"](spark, sf_dir).collect()}
    assert rows
    monthly = (
        read_table(spark, sf_dir, "orders")
        .join(read_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(read_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date")).cast("date").alias("mo"),
            "n_name",
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
        .collect()
    )
    by_mo: dict = {}
    for r in monthly:
        by_mo.setdefault(r.mo, []).append(r.cents)
    for mo, xs in by_mo.items():
        tot = sum(xs)
        hhi = sum(x * x for x in xs) / (tot * tot)
        r = rows[mo]
        assert r.n_nations == len(xs)
        assert r.hhi == pytest.approx(hhi, abs=2e-6)
        # 1/k <= HHI <= 1
        assert 1 / len(xs) - 1e-9 <= r.hhi <= 1.0
