"""Round-3 wave 6: LEFT ARRAY JOIN positions, avgWeighted/covarPop,
and integer-division semantics. Pure-Python recomputes keep both
engines honest."""

from __future__ import annotations

import json
import math
import re
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_array_join_positions_matches_python(spark, sf_dir, qs):
    out = {r.pos: r for r in
           qs["array_join_positions"](spark, sf_dir).collect()}
    docs = [r.text for r in read_table(
        spark, sf_dir, "documents").select("text").collect()]
    per = defaultdict(lambda: defaultdict(int))
    n_empty = 0
    for text in docs:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t][:5]
        if not toks:
            n_empty += 1
        for i, t in enumerate(toks, start=1):
            per[i][t] += 1
    assert set(out) == set(per)
    for pos, counts in per.items():
        r = out[pos]
        assert r.n_docs == sum(counts.values())
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r.top_token, r.top_count) == best
        assert r.n_empty_docs == n_empty


def test_avg_weighted_covar_matches_python(spark, sf_dir, qs):
    out = {r.p_brand: r for r in
           qs["avg_weighted_covar"](spark, sf_dir).collect()}
    parts = {r.p_partkey: r.p_brand for r in read_table(
        spark, sf_dir, "part").select("p_partkey", "p_brand").collect()}
    per = defaultdict(list)
    for r in read_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_quantity", "l_extendedprice").collect():
        per[parts[r.l_partkey]].append(
            (round(r.l_quantity), round(r.l_extendedprice * 100))
        )
    assert set(out) == set(per)
    for brand, rows in per.items():
        n = len(rows)
        sq = sum(q for q, _ in rows)
        sp = sum(p for _, p in rows)
        sqp = sum(q * p for q, p in rows)
        r = out[brand]
        assert r.n_lines == n
        assert math.isclose(
            r.avg_weighted_price, sqp / sq / 100.0, rel_tol=1e-9, abs_tol=1e-6
        )
        covp = (sqp / n - (sq / n) * (sp / n)) / 100.0
        assert math.isclose(r.covar_pop, covp, rel_tol=1e-6, abs_tol=1e-4)
        assert math.isclose(
            r.covar_samp, covp * n / (n - 1), rel_tol=1e-6, abs_tol=1e-4
        )


def test_integer_division_semantics_matches_python(spark, sf_dir, qs):
    out = {r.event_type: r for r in
           qs["integer_division_semantics"](spark, sf_dir).collect()}
    per = defaultdict(list)
    for r in read_table(spark, sf_dir, "events").select(
            "event_type", "props").collect():
        per[r.event_type].append(json.loads(r.props)["k"] - 50)
    for t, ks in per.items():
        r = out[t]
        # int() truncates toward zero — the intDiv contract
        tdivs = [int(k / 7) for k in ks]
        trems = [k - int(k / 7) * 7 for k in ks]
        pmods = [k % 7 for k in ks]  # Python % is already positive for d>0
        assert r.n == len(ks)
        assert r.n_negative == sum(1 for k in ks if k < 0)
        assert r.sum_intdiv == sum(tdivs)
        assert r.sum_modulo == sum(trems)
        assert r.sum_positive_modulo == sum(pmods)
        assert r.min_modulo == min(trems)
        assert r.min_positive_modulo == min(pmods)
        # the semantic point: trunc-modulo goes negative, pmod never does
        if r.n_negative:
            assert r.min_modulo < 0 <= r.min_positive_modulo
