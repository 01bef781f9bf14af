"""Semantic invariants for the batch-8 analytics queries (FIFO interval
matching, embedding covariance, Benford screen, Pareto concentration).
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


def test_fifo_match_equals_sequential_replay(spark, sf_dir, qs):
    rows = qs["fifo_attribution_match"](spark, sf_dir).collect()
    assert rows
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id", "event_type", "ts", "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_user: dict[int, dict[str, list[int]]] = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        by_user.setdefault(r.user_id, {"view": [], "purchase": []})[
            r.event_type
        ].append(r.cents)
    # sequential FIFO replay: walk both queues, emit (d_idx, s_idx, qty)
    expected: dict[tuple, int] = {}
    for u, q in by_user.items():
        si, di = 0, 0
        s_rem = q["view"][0] if q["view"] else 0
        d_rem = q["purchase"][0] if q["purchase"] else 0
        while si < len(q["view"]) and di < len(q["purchase"]):
            m = min(s_rem, d_rem)
            if m > 0:
                expected[(u, di + 1, si + 1)] = m
            s_rem -= m
            d_rem -= m
            if s_rem == 0:
                si += 1
                s_rem = q["view"][si] if si < len(q["view"]) else 0
            if d_rem == 0:
                di += 1
                d_rem = q["purchase"][di] if di < len(q["purchase"]) else 0
    got = {(r.user_id, r.d_idx, r.s_idx): r.matched_cents for r in rows}
    # the interval formulation also emits zero-width touches at exact
    # boundaries; drop them for the comparison with the strict replay
    got_pos = {k: v for k, v in got.items() if v > 0}
    assert got_pos == expected


def test_fifo_match_conserves_demand(spark, sf_dir, qs):
    rows = qs["fifo_attribution_match"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    tot = {
        r.event_type: r.c
        for r in ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("c"))
        .collect()
    }
    # total matched = sum over users of min(supply, demand) <= both totals
    matched = sum(r.matched_cents for r in rows)
    assert 0 < matched <= min(tot["view"], tot["purchase"])


def test_embedding_covariance_matches_numpy(spark, sf_dir, qs):
    import numpy as np

    got = {
        (r.label, r.i, r.j): r.cov
        for r in qs["embedding_covariance"](spark, sf_dir).collect()
    }
    em = read_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in em:
        by_label.setdefault(r.label, []).append(r.embedding[:4])
    for label, vecs in by_label.items():
        a = np.array(vecs, dtype=np.float64)
        c = np.cov(a, rowvar=False, bias=True)
        for i in range(4):
            for j in range(i, 4):
                assert got[(label, i, j)] == pytest.approx(c[i, j], abs=2e-6)


def test_benford_counts_and_chi2(spark, sf_dir, qs):
    rows = qs["benford_first_digit"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    n = read_table(spark, sf_dir, "orders").count()
    assert sum(r.obs for r in rows) == n
    for r in rows:
        assert r.expected > 0 and r.chi2_contrib >= 0


def test_pareto_thresholds(spark, sf_dir, qs):
    rows = qs["pareto_revenue_concentration"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_top80 <= r.n_customers
        assert r.share_ppm == (r.n_top80 * 1_000_000) // r.n_customers
        # ranked by revenue descending, the worst case (all-equal
        # revenues) needs ceil(0.8*n) customers to reach 80% of revenue
        assert r.n_top80 <= -(-4 * r.n_customers // 5)
