"""Round-3 wave 10: array predicates (hasAll/hasAny/hasSubstr/indexOf/
countEqual), bitCount distribution, roundToExp2 histogram.
Pure-Python recomputes keep both engines honest."""

from __future__ import annotations

import json
import re
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_array_predicates_report_matches_python(spark, sf_dir, qs):
    out = qs["array_predicates_report"](spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in read_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    hits = 0
    for r in out:
        t = [x for x in re.split("[^a-z0-9]+", docs[r.doc_id].lower()) if x]
        s = set(t)
        assert r.has_all == int({"the", "data"} <= s)
        assert r.has_any == int(bool({"spark", "stream", "batch"} & s))
        sub = any(t[i] == "key" and t[i + 1] == "order"
                  for i in range(len(t) - 1))
        assert r.has_substr_key_order == int(sub)
        hits += r.has_substr_key_order
        assert r.index_of_join == (t.index("join") + 1 if "join" in t else 0)
        assert r.count_equal_merge == sum(1 for x in t if x == "merge")
    # the contiguous-subsequence probe must separate the corpus
    assert 0 < hits < len(out)


def test_bit_count_distribution_matches_python(spark, sf_dir, qs):
    out = {r.pop: r for r in
           qs["bit_count_distribution"](spark, sf_dir).collect()}
    agg = defaultdict(set)
    n = defaultdict(int)
    for r in read_table(spark, sf_dir, "events").select("props").collect():
        k = json.loads(r.props)["k"]
        p = bin(k).count("1")
        agg[p].add(k)
        n[p] += 1
    assert set(out) == set(agg)
    for p, ks in agg.items():
        r = out[p]
        assert r.n == n[p]
        assert r.n_distinct_k == len(ks)
        assert (r.min_k, r.max_k) == (min(ks), max(ks))


def test_power_of_two_histogram_matches_python(spark, sf_dir, qs):
    out = {r.exp2: r for r in
           qs["power_of_two_histogram"](spark, sf_dir).collect()}
    agg = defaultdict(list)
    for r in read_table(spark, sf_dir, "orders").select(
            "o_totalprice").collect():
        c = round(r.o_totalprice * 100)
        agg[c.bit_length() - 1].append(c)
    assert set(out) == set(agg)
    for e, cs in agg.items():
        r = out[e]
        assert r.bucket_lo == 2 ** e
        assert r.n == len(cs)
        assert r.sum_cents == sum(cs)
        assert (r.min_cents, r.max_cents) == (min(cs), max(cs))
        # bucket invariant: every member is in [2^e, 2^(e+1))
        assert 2 ** e <= r.min_cents and r.max_cents < 2 ** (e + 1)
