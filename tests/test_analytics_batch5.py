"""Semantic invariants for the batch-5 analytics queries (BM25 retrieval,
rising-revenue streaks, day-of-week x hour heatmap, MAD robust stats).
Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_bm25_matches_python_reference(spark, sf_dir, qs):
    rows = qs["bm25_keyword_search"](spark, sf_dir).collect()
    assert rows
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    terms = ["spark", "join", "table"]
    toks = {d.doc_id: [w for w in d.text.lower().split() if w] for d in docs}
    dls = {i: len(t) for i, t in toks.items()}
    n_docs = len(docs)
    avgdl = sum(dls.values()) / n_docs
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}

    def bm25(doc_id):
        c = Counter(toks[doc_id])
        s = 0.0
        for t in terms:
            tf = c[t]
            if tf == 0:
                continue
            idf = math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dls[doc_id] / avgdl))
        return s

    want = sorted(((bm25(i), -i) for i in toks), reverse=True)[: len(rows)]
    for r, (ws, wid) in zip(rows, want):
        assert r.doc_id == -wid
        assert r.bm25 == pytest.approx(ws, abs=1e-5)


def test_streaks_are_maximal_rising_runs(spark, sf_dir, qs):
    rows = qs["revenue_streaks"](spark, sf_dir).collect()
    assert rows
    daily = sorted(
        read_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .collect(),
        key=lambda r: r.d,
    )
    rev = {r.d: r.rev for r in daily}
    days = [r.d for r in daily]
    pos = {d: i for i, d in enumerate(days)}
    for r in rows:
        i, j = pos[r.start_d], pos[r.end_d]
        assert r.streak_days == j - i + 1
        for k in range(i, j + 1):  # every day in the streak rose
            assert rev[days[k]] > rev[days[k - 1]]
        # maximality: the streak cannot extend on either side
        if j + 1 < len(days):
            assert not rev[days[j + 1]] > rev[days[j]]
        assert i > 0 and not rev[days[i - 1]] > rev[days[i - 2]] if i >= 2 else True


def test_heatmap_covers_all_events(spark, sf_dir, qs):
    rows = qs["dow_hour_heatmap"](spark, sf_dir).collect()
    total = read_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total
    for r in rows:
        assert 1 <= r.isodow <= 7
        assert 0 <= r.hour <= 23
    assert len(rows) == len({(r.isodow, r.hour) for r in rows})


def test_mad_matches_numpy(spark, sf_dir, qs):
    import numpy as np

    rows = qs["mad_robust_stats"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.value)
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        vals = np.array(by_type[r.event_type])
        med = np.percentile(vals, 50)  # numpy default = linear (R-7)
        mad = np.percentile(np.abs(vals - med), 50)
        assert r.med == pytest.approx(med, abs=1e-6)
        assert r.mad == pytest.approx(mad, abs=1e-6)
        assert r.n == len(vals)
        n_out = int(np.sum(np.abs(vals - med) > 3 * mad))
        assert r.n_outliers == n_out
