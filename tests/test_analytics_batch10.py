"""Semantic invariants for the batch-10 queries (positional phrase
search, order->ship CCF, column profiling, discrete percentiles).
Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_phrase_search_matches_python_count(spark, sf_dir, qs):
    rows = qs["phrase_search_positional"](spark, sf_dir).collect()
    assert rows
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    counts = {}
    for r in docs:
        toks = r.text.split(" ")
        c = sum(
            1
            for a, b in zip(toks, toks[1:])
            if a == "value" and b == "table"
        )
        if c:
            counts[r.doc_id] = c
    expected_top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.doc_id, r.n_hits) for r in rows]
    assert got == expected_top


def test_ccf_shipping_lags_ordering(spark, sf_dir, qs):
    rows = {r.k: r for r in qs["ccf_order_to_ship"](spark, sf_dir).collect()}
    assert set(rows) == set(range(-7, 8))
    for r in rows.values():
        assert -1.0 <= r.ccf <= 1.0 and r.n > 0
    # shipping follows ordering: the best positive lag should beat the
    # best negative lag (TPC-H ships strictly after the order date)
    best_pos = max(rows[k].ccf for k in range(1, 8))
    best_neg = max(rows[k].ccf for k in range(-7, 0))
    assert best_pos >= best_neg


def test_profile_matches_direct_aggregates(spark, sf_dir, qs):
    rows = {r.column_name: r for r in qs["profile_orders_columns"](spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders")
    assert set(rows) == set(o.columns)
    n = o.count()
    for c in o.columns:
        r = rows[c]
        assert r.n_rows == n
        assert r.n_null == o.filter(F.col(c).isNull()).count()
        # COUNT(DISTINCT col) excludes NULLs in both engines
        assert r.n_distinct == o.na.drop(subset=[c]).select(c).distinct().count()


def test_percentile_disc_values_exist_and_bound(spark, sf_dir, qs):
    rows = qs["percentile_disc_by_segment"](spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cents = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_seg: dict[str, list[int]] = {}
    for r in cents:
        by_seg.setdefault(r.c_mktsegment, []).append(r.cents)
    import math

    for r in rows:
        xs = sorted(by_seg[r.seg])
        expect = xs[math.ceil(r.q * len(xs) / 100) - 1]
        assert r.value_cents == expect
    # p50 <= p90 <= p99 within each segment
    by = {}
    for r in rows:
        by.setdefault(r.seg, {})[r.q] = r.value_cents
    for seg, d in by.items():
        assert d[50] <= d[90] <= d[99]
