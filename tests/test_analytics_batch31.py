"""Round-3 wave 4: DSIR importance weights, quantileExactWeighted,
strict-order windowFunnel, and multiSearchAllPositions. Python
recomputes keep both engines honest."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from clickhouse_forecasting_spark.queries import (
    _DSIR_BUCKETS,
    _MULTI_SEARCH_NEEDLES,
    SPARK_QUERIES,
)
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % _DSIR_BUCKETS


def test_dsir_scores_match_reference_formula(spark, sf_dir, qs):
    rows = {r.doc_id: r for r in qs["dsir_importance_weights"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    from collections import Counter, defaultdict

    raw, tgt = Counter(), Counter()
    per_doc = {}
    for d in docs:
        c = Counter(_bucket(t) for t in _toks(d.text))
        per_doc[d.doc_id] = c
        raw.update(c)
        if d.lang == "en":
            tgt.update(c)
    R, T = sum(raw.values()), sum(tgt.values())
    lam = {
        b: round(
            math.log(
                ((tgt.get(b, 0) + 1) / (T + _DSIR_BUCKETS))
                / ((raw.get(b, 0) + 1) / (R + _DSIR_BUCKETS))
            ),
            6,
        )
        for b in range(_DSIR_BUCKETS)
    }
    assert set(rows) == set(per_doc)
    n_selected = 0
    for doc_id, c in per_doc.items():
        r = rows[doc_id]
        assert r.n_tokens == sum(c.values())
        score = sum(n * lam[b] for b, n in c.items())
        assert math.isclose(r.dsir_score, score, abs_tol=2e-4)
        assert r.selected == (r.dsir_score > 0)
        n_selected += r.selected
    # en docs should be preferentially selected — sanity on the signal
    en_sel = sum(1 for d in docs if d.lang == "en" and rows[d.doc_id].selected)
    other_sel = n_selected - en_sel
    n_en = sum(1 for d in docs if d.lang == "en")
    assert en_sel / n_en > other_sel / max(1, len(docs) - n_en)


def test_weighted_quantiles_match_cumulative_rule(spark, sf_dir, qs):
    rows = {r.brand: r for r in qs["quantiles_exact_weighted"](spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    ).collect()
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand").collect()
    brand_of = {x.p_partkey: x.p_brand for x in p}
    from collections import defaultdict

    vals = defaultdict(list)
    for x in li:
        b = brand_of.get(x.l_partkey)
        if b is not None:
            vals[b].append((round(x.l_extendedprice * 100), int(x.l_quantity)))
    for b, pairs in vals.items():
        pairs.sort()
        W = sum(w for _, w in pairs)
        r = rows[b]
        assert r.w_total == W

        def q_at(num, den):
            cum = 0
            for cents, w in pairs:
                cum += w
                if den * cum >= num * W:
                    return cents / 100.0
            raise AssertionError

        assert r.p25 == q_at(1, 4)
        assert r.p50 == q_at(1, 2)
        assert r.p75 == q_at(3, 4)
        assert r.p25 <= r.p50 <= r.p75


def test_strict_funnel_partitions_users_and_respects_order(spark, sf_dir, qs):
    rows = {r.funnel_level: r.n_users for r in qs["window_funnel_strict"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    from collections import defaultdict

    streams = defaultdict(list)
    for e in ev:
        streams[e.user_id].append(e)
    expect = defaultdict(int)
    day_us = 24 * 3600 * 1_000_000
    for u, es in streams.items():
        es.sort(key=lambda e: (e.ts, e.event_id))
        us = [int(e.ts.timestamp() * 1_000_000) for e in es]
        lvl = 0
        for i, e in enumerate(es):
            if e.event_type != "view":
                continue
            lvl = max(lvl, 1)
            if i + 1 < len(es) and es[i + 1].event_type == "click":
                if i + 2 < len(es) and es[i + 2].event_type == "purchase" \
                        and us[i + 2] <= us[i] + day_us:
                    lvl = max(lvl, 3)
                elif us[i + 1] <= us[i] + day_us:
                    lvl = max(lvl, 2)
        expect[lvl] += 1
    assert rows == dict(expect)
    assert sum(rows.values()) == len(streams)


def test_multi_search_positions_match_str_find(spark, sf_dir, qs):
    rows = qs["multi_search_positions"](spark, sf_dir).collect()
    docs = {d.doc_id: d.text for d in read_table(spark, sf_dir, "documents").collect()}
    assert len(rows) == len(docs)
    for r in rows:
        text = docs[r.doc_id]
        found = 0
        for n in _MULTI_SEARCH_NEEDLES:
            pos = text.find(n) + 1
            assert getattr(r, f"pos_{n}") == pos
            found += pos > 0
        assert r.n_found == found
