"""Semantic invariants for the batch-4 analytics queries (largest-remainder
proration, weekly cohort retention, phonetic word grouping). Cross-engine
value equality is covered by the DuckDB oracle gate; these pin the
semantics a hash can't explain.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_proration_conserves_cents_exactly(spark, sf_dir, qs):
    alloc = qs["allocation_proration"](spark, sf_dir)
    totals = (
        alloc.groupBy("l_orderkey")
        .agg(F.sum("alloc_cents").alias("alloc_total"))
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    mismatched = (
        totals.join(orders, "l_orderkey")
        .filter(F.col("alloc_total") != F.col("total_cents"))
        .count()
    )
    assert mismatched == 0  # every cent lands somewhere, none invented


def test_proration_is_proportional_within_one_cent(spark, sf_dir, qs):
    rows = (
        qs["allocation_proration"](spark, sf_dir)
        .filter(F.col("l_orderkey") < 50)
        .collect()
    )
    assert rows
    by_order: dict[int, list] = {}
    for r in rows:
        by_order.setdefault(r.l_orderkey, []).append(r)
    for ok, items in by_order.items():
        sw = sum(r.price_cents for r in items)
        total = sum(r.alloc_cents for r in items)
        for r in items:
            exact = total * r.price_cents / sw
            assert abs(r.alloc_cents - exact) < 1.0, (ok, r)


def test_cohort_offset_zero_is_cohort_size(spark, sf_dir, qs):
    rows = qs["cohort_retention_weekly"](spark, sf_dir).collect()
    assert rows
    size0 = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    for r in rows:
        assert r.week_offset >= 0
        # week-0 always exists (the first event IS in the cohort week) and
        # no later week can retain more users than the cohort has
        assert r.cohort_week in size0
        assert r.n_users <= size0[r.cohort_week]
    total_cohorted = sum(size0.values())
    n_users = read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert total_cohorted == n_users  # every user lands in exactly one cohort


def test_rfm_scores_are_balanced_quintiles(spark, sf_dir, qs):
    rows = qs["rfm_segmentation"](spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for field in ("r_score", "f_score", "m_score"):
        counts: dict[int, int] = {}
        for r in rows:
            v = r[field]
            assert 1 <= v <= 5
            counts[v] = counts.get(v, 0) + 1
        # ntile buckets differ in size by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
        assert sum(counts.values()) == n
    # better monetary value can never get a worse (higher) m_score
    by_m = sorted(rows, key=lambda r: (-r.monetary, r.custkey))
    scores = [r.m_score for r in by_m]
    assert scores == sorted(scores)


def test_triangles_match_bruteforce(spark, sf_dir, qs):
    row = qs["trade_graph_triangles"](spark, sf_dir).collect()[0]
    # rebuild the edge set with the same relative threshold and count
    # triangles brute-force on the <=25-vertex graph
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"),
        )
        .groupBy("a", "b")
        .agg(F.sum("v").alias("volume"))
        .collect()
    )
    mean_v = sum(r.volume for r in vol) / len(vol)
    edges = {(r.a, r.b) for r in vol if r.volume > 1.05 * mean_v}
    nodes = sorted({x for e in edges for x in e})
    brute = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        for cc in nodes
        if cc > b and (a, b) in edges and (b, cc) in edges and (a, cc) in edges
    )
    assert row.n_triangles == brute
    assert row.n_distinct == row.n_triangles  # a<b<c canonical form: no dupes


def test_funnel_regex_agrees_with_event_order(spark, sf_dir, qs):
    rows = {r.user_id: r for r in qs["funnel_sequence_regex"](spark, sf_dir).collect()}
    assert rows
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    for uid, events in by_user.items():
        events.sort(key=lambda e: (e.ts, e.event_id))
        seq = "".join(e.event_type[0] for e in events)
        r = rows[uid]
        assert r.n_events == len(seq)
        assert r.n_purchases == seq.count("p")
        hit = False
        state = 0
        for ch in seq:
            if state == 0 and ch == "s":
                state = 1
            elif state == 1 and ch == "v":
                state = 2
            elif state == 2 and ch == "p":
                hit = True
                break
        assert r.funnel_hit == hit


def test_ewma_matches_python_reference(spark, sf_dir, qs):
    rows = sorted(qs["ewma_daily_revenue"](spark, sf_dir).collect(), key=lambda r: r.d)
    assert rows
    cents = [round(r.revenue * 100) for r in rows]
    for i, r in enumerate(rows):
        lo = max(0, i - 15)
        num = sum(cents[j] * (1 << (15 - (i - j))) for j in range(lo, i + 1))
        d2 = sum(1 << (15 - (i - j)) for j in range(lo, i + 1)) * 100
        micro = (num // d2) * 1_000_000 + ((num % d2) * 1_000_000) // d2
        assert r.ewma_micro == micro
    # day 1 has no history: ewma == that day's revenue (floored to micros)
    assert rows[0].ewma_micro == (round(rows[0].revenue * 100) * 10_000)


def test_token_entropy_bounds_and_reference(spark, sf_dir, qs):
    import math
    from collections import Counter

    rows = {r.doc_id: r for r in qs["token_entropy"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for doc in docs[:50]:
        toks = [w for w in doc.text.lower().split() if w]
        c = Counter(toks)
        n = len(toks)
        want = -sum((k / n) * math.log(k / n) for k in c.values()) / math.log(2)
        r = rows[doc.doc_id]
        assert r.n_tokens == n
        assert r.entropy_bits == pytest.approx(want, abs=1e-5)
        # entropy of an n-token doc is bounded by log2(distinct tokens)
        assert -1e-9 <= r.entropy_bits <= math.log2(max(len(c), 2)) + 1e-9


def test_phonetic_groups_share_fingerprint(spark, sf_dir, qs):
    rows = qs["phonetic_word_groups"](spark, sf_dir).collect()
    assert rows  # the fixture vocabulary has at least one collision

    def fp(w: str) -> str:
        return w[0] + re.sub(r"[AEIOU]", "", w[1:])

    for r in rows:
        words = r.words.split(",")
        assert len(words) == r.n_words >= 2
        assert len(set(words)) == r.n_words  # distinct words only
        assert {fp(w) for w in words} == {r.fingerprint}
