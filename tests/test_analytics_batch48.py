"""Round-3 wave 14: groupArraySorted(k), quantileDeterministic-style
reproducible sampling, and rounding-semantics parity.
Pure-Python recomputes keep both engines honest."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_group_array_sorted_topn_matches_python(spark, sf_dir, qs):
    out = {r.nationkey: r for r in
           qs["group_array_sorted_topn"](spark, sf_dir).collect()}
    per = defaultdict(list)
    for r in read_table(spark, sf_dir, "customer").select(
            "c_nationkey", "c_acctbal").collect():
        per[r.c_nationkey].append(round(r.c_acctbal * 100))
    assert set(out) == set(per)
    for nk, cents in per.items():
        r = out[nk]
        assert r.n_customers == len(cents)
        want = ",".join(str(c) for c in sorted(cents)[:5])
        assert r.bottom5_cents_csv == want


def test_deterministic_sample_quantile_matches_python(spark, sf_dir, qs):
    out = {r.event_type: r for r in
           qs["deterministic_sample_quantile"](spark, sf_dir).collect()}
    full = defaultdict(list)
    samp = defaultdict(list)
    for r in read_table(spark, sf_dir, "events").select(
            "event_type", "event_id", "value").collect():
        c = round(r.value * 100)
        full[r.event_type].append(c)
        h = int(hashlib.md5(str(r.event_id).encode()).hexdigest()[:15], 16)
        if h % 8 == 0:
            samp[r.event_type].append(c)
    for t, cs in full.items():
        cs.sort()
        r = out[t]
        assert r.n_p50_full == len(cs)
        assert r.p50_full == cs[math.ceil(len(cs) / 2) - 1]
        ss = sorted(samp[t])
        assert r.n_p50_sample == len(ss)
        assert r.p50_sample == ss[math.ceil(len(ss) / 2) - 1]
        assert r.abs_err == abs(r.p50_full - r.p50_sample)


def test_rounding_semantics_matches_python(spark, sf_dir, qs):
    out = {r.event_type: r for r in
           qs["rounding_semantics_report"](spark, sf_dir).collect()}
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in read_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value").collect():
        # r4 semantics: sign alternates by event_id parity, remainder is
        # floor-consistent, half-away ties are sign-aware
        u = round(r.value * 1_000_000) * (-1 if r.event_id % 2 == 0 else 1)
        q, rem = divmod(u, 100000)  # python divmod IS floor-consistent
        if rem > 50000:
            ha = q + 1
        elif rem < 50000:
            ha = q
        else:
            ha = q if u < 0 else q + 1
        if rem > 50000:
            he = q + 1
        elif rem < 50000:
            he = q
        else:
            he = q if q % 2 == 0 else q + 1
        a = agg[r.event_type]
        a[0] += 1
        a[1] += ha
        a[2] += he
        a[3] += q
        a[4] += int(rem == 50000)
        a[5] += int(ha != he)
    assert set(out) == set(agg)
    for t, (n, sha, she, sfl, ties, div) in agg.items():
        r = out[t]
        assert (r.n, r.sum_round_half_away, r.sum_round_bankers,
                r.sum_floor, r.n_exact_ties, r.n_divergent) == (
            n, sha, she, sfl, ties, div)
        # divergence happens only on exact ties, and only on odd floors
        assert r.n_divergent <= r.n_exact_ties
