"""Semantic invariants for the batch-21 query (rapid repeat orders).
Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


def test_rapid_repeats_match_python(spark, sf_dir):
    qs = entry.queries()
    rows = qs["rapid_repeat_orders"](spark, sf_dir).collect()
    assert rows
    base = (
        read_table(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_cust: dict[int, list] = {}
    for r in base:
        by_cust.setdefault(r.o_custkey, []).append(r)
    expected = set()
    for cust, os_ in by_cust.items():
        for i, a in enumerate(os_):
            for b in os_[i + 1 :]:
                lo, hi = sorted((a, b), key=lambda r: r.o_orderkey)
                gap = abs((hi.d - lo.d).days)
                if gap <= 3:
                    expected.add((cust, lo.o_orderkey, hi.o_orderkey, gap))
    got = {(r.custkey, r.orderkey_1, r.orderkey_2, r.days_apart) for r in rows}
    assert got == expected
    for r in rows:
        assert r.orderkey_1 < r.orderkey_2
        assert 0 <= r.days_apart <= 3
        assert (
            r.amount_sim_ppm
            == (min(r.cents_1, r.cents_2) * 1_000_000) // max(r.cents_1, r.cents_2)
        )
        assert r.amount_sim_ppm <= 1_000_000
