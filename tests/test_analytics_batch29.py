"""Round-3 wave 2: groupBit aggregates, deterministic anyHeavy
(Boyer-Moore), ngramDistance, and SemDeDup cluster dedup. Python
recomputes keep both engines honest."""

from __future__ import annotations

import math

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_group_bit_ops_matches_python(spark, sf_dir, qs):
    rows = {r.event_type: r for r in qs["group_bit_ops"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for e in ev:
        groups[e.event_type].append(e.user_id)
    assert set(rows) == set(groups)
    from functools import reduce

    for t, users in groups.items():
        r = rows[t]
        assert r.n_events == len(users)
        assert r.bit_and_users == reduce(lambda a, b: a & b, users)
        assert r.bit_or_users == reduce(lambda a, b: a | b, users)
        assert r.bit_xor_users == reduce(lambda a, b: a ^ b, users)


def _boyer_moore(seq):
    cand, cnt = "", 0
    for w in seq:
        if cnt == 0:
            cand, cnt = w, 1
        elif w == cand:
            cnt += 1
        else:
            cnt -= 1
    return cand


def test_any_heavy_fold_matches_python(spark, sf_dir, qs):
    rows = {r.week: r for r in qs["any_heavy_daily_majority"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    from collections import Counter, defaultdict
    from datetime import timedelta

    per_day = defaultdict(Counter)
    for e in ev:
        per_day[e.ts.date()].update([e.event_type])
    winners = {}
    for d, c in per_day.items():
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        winners[d] = best
    weeks = defaultdict(list)
    for d in sorted(winners):
        monday = d - timedelta(days=d.weekday())
        weeks[monday].append(winners[d])
    assert set(rows) == set(weeks)
    for wk, seq in weeks.items():
        r = rows[wk]
        assert r.n_days == len(seq)
        assert r.bm_candidate == _boyer_moore(seq)
        c = Counter(seq)
        modal_days = max(c.values())
        mode = min(t for t, n in c.items() if n == modal_days)
        assert r.modal_winner == mode and r.modal_days == modal_days
        assert r.has_true_majority == int(modal_days * 2 > len(seq))
        # the Boyer-Moore guarantee: with a true majority, cand == mode
        if r.has_true_majority:
            assert r.bm_matches_mode == 1


def test_ngram_distance_matches_python(spark, sf_dir, qs):
    rows = qs["ngram_distance_names"](spark, sf_dir).collect()
    names = sorted(
        r.p_name
        for r in read_table(spark, sf_dir, "part").select("p_name").distinct().collect()
    )
    assert len(names) <= 64  # bounded vocabulary -> bounded pair space
    from collections import Counter

    def grams(s):
        return Counter(s[i : i + 3] for i in range(len(s) - 2))

    expect = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            ga, gb = grams(a), grams(b)
            inter = sum((ga & gb).values())
            dist = round(1 - 2 * inter / (sum(ga.values()) + sum(gb.values())), 6)
            if dist <= 0.5:
                expect[(a, b)] = (inter, dist)
    got = {(r.name_a, r.name_b): (r.shared_grams, r.ngram_dist) for r in rows}
    assert got == expect
    # identical prefixes land close: 'red ring'/'red rod' style pairs exist
    assert any(d < 0.5 for _, d in got.values())


def test_semdedup_clusters_invariants(spark, sf_dir, qs):
    rows = qs["semdedup_clusters"](spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    assert sum(r.n_vectors for r in rows) == len(emb)
    assert len(rows) <= 16
    for r in rows:
        assert r.n_kept == r.n_vectors - r.n_dropped
        assert 0 <= r.n_dropped < r.n_vectors  # min-id member always survives
        assert r.n_pairs == r.n_vectors * (r.n_vectors - 1) // 2
        if r.n_pairs:
            assert -1.0 <= r.mean_pair_cos <= 1.0


def test_semdedup_assignment_is_nearest_centroid(spark, sf_dir, qs):
    """Python argmin over true euclidean distance must agree with the
    ||c||^2 - 2<x,c> in-plan assignment (the ||x||^2 term is constant per
    vector, so the argmin is identical)."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    # r4 k(n) recipe: k = max(16, n // 64) centroids on an even vec_id
    # stride (see q_semdedup_clusters)
    n = len(emb)
    k = max(16, n // 64)
    stride = max(1, n // k)
    cents = {
        e.vec_id: e.embedding
        for e in emb
        if e.vec_id % stride == 0 and e.vec_id < stride * k
    }
    sizes = {}
    for e in emb:
        best = min(
            sorted(cents),
            key=lambda c: (
                sum((x - y) ** 2 for x, y in zip(e.embedding, cents[c])),
                c,
            ),
        )
        sizes[best] = sizes.get(best, 0) + 1
    got = {
        r.cluster: r.n_vectors
        for r in qs["semdedup_clusters"](spark, sf_dir).collect()
    }
    assert got == sizes
