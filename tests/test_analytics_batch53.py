"""Round-3 wave 19: CCNet perplexity buckets, split-conformal coverage,
and PSI drift. Pure-Python recomputes keep both engines honest."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_ccnet_perplexity_buckets_matches_python(spark, sf_dir, qs):
    out = {r.bucket: r for r in
           qs["ccnet_perplexity_buckets"](spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in read_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    toks = {d: [t for t in re.split("[^a-z0-9]+", x.lower()) if t]
            for d, x in docs.items()}
    bg = defaultdict(int)
    un = defaultdict(int)
    vocab = set()
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            bg[(a, b)] += 1
            un[a] += 1
            vocab |= {a, b}
    v = len(vocab)
    nll = {}
    for d, t in toks.items():
        if len(t) < 2:
            continue
        s = sum(
            round(-math.log((bg[(a, b)] + 1) / (un[a] + v)) * 1e9)
            for a, b in zip(t, t[1:])
        )
        nll[d] = s / 1e9 / max(len(t) - 1, 1)
    order = sorted(nll, key=lambda d: (nll[d], d))
    n = len(order)
    terciles = {"head": [], "middle": [], "tail": []}
    names = ["head", "middle", "tail"]
    # ntile(3) semantics: first ceil-sized groups get the extra rows
    base, extra = divmod(n, 3)
    sizes = [base + (1 if i < extra else 0) for i in range(3)]
    pos = 0
    for name, size in zip(names, sizes):
        terciles[name] = order[pos:pos + size]
        pos += size
    assert set(out) == {"head", "middle", "tail"}
    for name in names:
        members = terciles[name]
        r = out[name]
        assert r.n_docs == len(members)
        assert r.n_tokens == sum(len(toks[d]) for d in members)
        want = sum(round(nll[d] * 1e6) for d in members) / len(members) / 1e6
        assert math.isclose(r.mean_nll_per_tok, round(want, 6), abs_tol=2e-6)
    # terciles order by quality: head is lowest perplexity
    assert out["head"].mean_nll_per_tok <= out["middle"].mean_nll_per_tok \
        <= out["tail"].mean_nll_per_tok


def test_conformal_coverage_matches_python(spark, sf_dir, qs):
    r = qs["conformal_coverage_report"](spark, sf_dir).collect()[0]
    daily = defaultdict(int)
    for x in read_table(spark, sf_dir, "orders").select(
            "o_orderdate", "o_totalprice").collect():
        daily[x.o_orderdate.date()] += round(x.o_totalprice * 100)
    days = sorted(daily)
    # the split index counts ALL days (rn over the full series); the
    # first 7 days have no lag-7 prediction and drop out of both sets
    split_abs = len(days) * 7 // 10
    rows = []
    for i, d in enumerate(days):
        if i >= 7:
            rows.append((i + 1, d, abs(daily[d] - daily[days[i - 7]])))
    cal = sorted(
        [x for x in rows if x[0] <= split_abs],
        key=lambda x: (x[2], x[1]),
    )
    n_cal = len(cal)
    q_rank = min(math.ceil(0.9 * (n_cal + 1)), n_cal)
    qhat = cal[q_rank - 1][2]
    test = [x for x in rows if x[0] > split_abs]
    covered = sum(1 for _, _, res in test if res <= qhat)
    assert r.n_calibration == n_cal
    assert r.n_test == len(test)
    assert r.qhat_cents == qhat
    assert r.n_covered == covered
    assert r.coverage_ppm == covered * 1000000 // len(test)
    # split-conformal at 90%: coverage should be in a sane band
    assert 700000 <= r.coverage_ppm <= 1000000


def test_psi_drift_matches_python(spark, sf_dir, qs):
    r = qs["psi_drift_report"](spark, sf_dir).collect()[0]
    ref, cur = [], []
    for x in read_table(spark, sf_dir, "orders").select(
            "o_orderdate", "o_totalprice").collect():
        c = round(x.o_totalprice * 100)
        if x.o_orderdate.year == 1996:
            ref.append(c)
        elif x.o_orderdate.year == 1997:
            cur.append(c)
    sref = sorted(ref)
    n = len(sref)
    cuts = sorted({sref[(n * d) // 10 - 1] for d in range(1, 10)})

    def hist(vals):
        h = [0] * 10
        for c in vals:
            h[sum(1 for x in cuts if x < c)] += 1
        return h

    hp, hq = hist(ref), hist(cur)
    psi = 0
    for a, b in zip(hp, hq):
        ps = (a + 1) / (sum(hp) + 10)
        qs_ = (b + 1) / (sum(hq) + 10)
        psi += round((ps - qs_) * math.log(ps / qs_) * 1e9)
    psi /= 1e9
    assert r.n_ref == len(ref) and r.n_cur == len(cur)
    assert math.isclose(r.psi, round(psi, 6), abs_tol=2e-6)
    assert r.drift_warning == int(psi >= 0.1)
    assert r.drift_alert == int(psi >= 0.25)
    assert r.psi >= 0.0
