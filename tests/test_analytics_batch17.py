"""Semantic invariants for the batch-17 diagnostics queries (key-skew
report, weekly rank movers). Cross-engine value equality is covered by
the DuckDB oracle gate.
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


def test_key_skew_matches_python(spark, sf_dir, qs):
    rows = {r.key_name: r for r in qs["key_skew_report"](spark, sf_dir).collect()}
    assert set(rows) == {
        "orders.o_custkey", "lineitem.l_partkey", "lineitem.l_suppkey",
    }
    o = read_table(spark, sf_dir, "orders")
    counts = [
        r["count"]
        for r in o.groupBy("o_custkey").count().collect()
    ]
    counts.sort()
    r = rows["orders.o_custkey"]
    assert r.n_keys == len(counts)
    assert r.max_n == max(counts)
    assert r.p50_n == counts[math.ceil(len(counts) * 50 / 100) - 1]
    assert r.p99_n == counts[math.ceil(len(counts) * 99 / 100) - 1]
    assert r.skew_ratio_ppm == (r.max_n * 1_000_000) // r.p50_n
    for r in rows.values():
        assert r.p50_n <= r.p99_n <= r.max_n
        assert r.skew_ratio_ppm >= 1_000_000


def test_rank_movers_deltas_consistent(spark, sf_dir, qs):
    rows = qs["weekly_rank_movers"](spark, sf_dir).collect()
    assert rows
    # rebuild full rank grid and verify every reported delta
    weekly = (
        read_table(spark, sf_dir, "orders")
        .filter(F.year(F.col("o_orderdate").cast("date")) == 1995)
        .join(read_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(read_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.date_trunc("week", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("wk"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
        .collect()
    )
    by_week: dict[int, list] = {}
    for r in weekly:
        by_week.setdefault(r.wk, []).append((-r.cents, r.n_name))
    rank = {}
    for wk, entries in by_week.items():
        for i, (_, name) in enumerate(sorted(entries), start=1):
            rank[(name, wk)] = i
    prev_week: dict[str, list[int]] = {}
    for (name, wk), _ in rank.items():
        prev_week.setdefault(name, []).append(wk)
    for r in rows:
        assert rank[(r.n_name, r.wk)] == r.rnk
        wks = sorted(prev_week[r.n_name])
        prior = max(w for w in wks if w < r.wk)
        assert r.delta == rank[(r.n_name, prior)] - r.rnk
        assert r.delta != 0
