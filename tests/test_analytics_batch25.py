"""Semantic invariants for the batch-25 corpus-policy queries (blocklist
gate, duplicated-substring spans, temperature domain mixing, shard JS
divergence). Cross-engine value equality is covered by the DuckDB oracle
gate; these pin the math the hashes can't explain.
"""

from __future__ import annotations

import math
import re

import pytest

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table

BLOCKLIST = {"slow", "merge", "spam"}


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_blocklist_report_matches_python_recompute(spark, sf_dir, qs):
    rows = qs["blocklist_filter_report"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    by_src: dict[str, list[list[str]]] = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(_toks(d.text))
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        toksets = by_src[r.source]
        hits = [sum(1 for t in ts if t in BLOCKLIST) for ts in toksets]
        assert r.n_docs == len(toksets)
        assert r.n_flagged == sum(1 for h in hits if h > 0)
        assert r.blocked_hits == sum(hits)
        assert r.tokens_total == sum(len(ts) for ts in toksets)
        kept = sum(len(ts) for ts, h in zip(toksets, hits) if h == 0)
        assert r.tokens_kept == kept
        assert r.kept_ppm == kept * 1_000_000 // r.tokens_total


def test_blocklist_zero_hit_term_costs_nothing(spark, sf_dir, qs):
    # 'spam' never occurs in the fixture vocab; flagged counts must be
    # explained entirely by the two real terms
    docs = read_table(spark, sf_dir, "documents").select("text").collect()
    assert all("spam" not in _toks(d.text) for d in docs)


def test_dup_span_report_invariants(spark, sf_dir, qs):
    rows = qs["dup_span_report"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert sorted(r.rank for r in rows) == list(range(1, 21))
    ranked = sorted(rows, key=lambda r: r.rank)
    spans = [r.max_dup_span for r in ranked]
    assert spans == sorted(spans, reverse=True)
    for r in rows:
        assert 0 <= r.dup_shingles <= r.n_shingles
        if r.max_dup_span:
            # a span of S tokens is a run of S-4 consecutive 5-gram
            # shingles, all duplicated
            assert r.max_dup_span >= 5
            assert r.max_dup_span - 4 <= r.dup_shingles
        else:
            assert r.dup_shingles >= 0


def test_dup_span_doc0_has_no_dups_from_earlier(spark, sf_dir, qs):
    # doc_id 0 has no earlier doc, so it can never appear with dup>0 span
    rows = qs["dup_span_report"](spark, sf_dir).collect()
    for r in rows:
        if r.doc_id == 0:
            assert r.max_dup_span == 0 and r.dup_shingles == 0


def test_temperature_mix_weights(spark, sf_dir, qs):
    rows = qs["domain_temperature_mix"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    # rounded weights sum to 1 within len(rows) ulps of the 1e-6 grid
    assert abs(sum(r.weight for r in rows) - 1.0) <= len(rows) * 1e-6
    # alpha=0.5 flattens: smaller shards get a strictly larger sample
    # factor; factors bracket 1.0 unless all shards are equal-sized
    by_docs = sorted(rows, key=lambda r: r.n_docs)
    for a, b in zip(by_docs, by_docs[1:]):
        if a.n_docs < b.n_docs:
            assert a.sample_factor > b.sample_factor
    if by_docs[0].n_docs < by_docs[-1].n_docs:
        assert by_docs[0].sample_factor > 1.0 > by_docs[-1].sample_factor
    for r in rows:
        expect = math.sqrt(r.n_docs) / sum(math.sqrt(x.n_docs) for x in rows)
        assert abs(r.weight - expect) < 5e-6


def test_js_divergence_bounds_and_shape(spark, sf_dir, qs):
    rows = qs["shard_js_divergence"](spark, sf_dir).collect()
    srcs = {r.src_a for r in rows} | {r.src_b for r in rows}
    k = len(srcs)
    assert len(rows) == k * (k - 1) // 2
    assert len({(r.src_a, r.src_b) for r in rows}) == len(rows)
    ln2 = math.log(2.0)
    for r in rows:
        assert r.src_a < r.src_b
        assert -1e-9 <= r.js_div <= ln2 + 1e-9
        assert 1 <= r.n_tokens_union


def test_bpe_merge_candidates_match_python(spark, sf_dir, qs):
    rows = qs["bpe_merge_candidates"](spark, sf_dir).collect()
    assert len(rows) == 20
    docs = read_table(spark, sf_dir, "documents").select("text").collect()
    from collections import Counter

    wf: Counter = Counter()
    for d in docs:
        wf.update(_toks(d.text))
    weighted: Counter = Counter()
    types: dict[str, set] = {}
    for w, c in wf.items():
        for i in range(len(w) - 1):
            pair = w[i : i + 2]
            weighted[pair] += c
            types.setdefault(pair, set()).add(w)
    expect = sorted(weighted.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(rows, key=lambda r: r.rank)
    for r, (pair, cnt) in zip(got, expect):
        assert r.pair == pair and r.weighted_count == cnt
        assert r.n_word_types == len(types[pair])


def test_embedding_pca_power_invariants(spark, sf_dir, qs):
    rows = sorted(qs["embedding_pca_power"](spark, sf_dir).collect(), key=lambda r: r.dim)
    assert [r.dim for r in rows] == list(range(16))
    lam = {r.eigenvalue for r in rows}
    assert len(lam) == 1
    lam = lam.pop()
    assert lam > 0
    # loadings are a unit vector (up to the 1e-6 output rounding)
    norm2 = sum(r.loading**2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-4
    # sign convention: dim-0 loading is non-negative
    assert rows[0].loading >= 0
    # the dominant eigenvalue is bounded by the covariance trace
    import numpy as np

    emb = read_table(spark, sf_dir, "embeddings").select("embedding").collect()
    X = np.array([r.embedding[:16] for r in emb], dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    assert lam <= np.trace(C) + 1e-6
    # and matches numpy's dominant eigenvalue to power-iteration accuracy
    top = float(np.linalg.eigvalsh(C)[-1])
    assert lam <= top + 1e-6
