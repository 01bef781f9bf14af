"""Round-3 wave 4: vector-distance family, ANN hard negatives,
minMap/maxMap/avgMap, and deterministic batch-GD linear regression.
Pure-Python recomputes keep both engines honest."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return {r.vec_id: (list(r.embedding), r.label) for r in read_table(
        spark, sf_dir, "embeddings").collect()}


def test_vector_distance_family_matches_python(spark, sf_dir, qs, vecs):
    out = qs["vector_distance_family"](spark, sf_dir).collect()
    q = vecs[0][0]
    assert len(out) == len(vecs)
    for r in out[:100]:
        v = vecs[r.vec_id][0]
        diff = [a - b for a, b in zip(v, q)]
        l1 = sum(abs(d) for d in diff)
        l2 = math.sqrt(sum(d * d for d in diff))
        linf = max(abs(d) for d in diff)
        dot = sum(a * b for a, b in zip(v, q))
        na = math.sqrt(sum(a * a for a in v))
        nb = math.sqrt(sum(b * b for b in q))
        assert math.isclose(r.l1, l1, rel_tol=1e-5, abs_tol=1e-5)
        assert math.isclose(r.l2, l2, rel_tol=1e-5, abs_tol=1e-5)
        assert math.isclose(r.linf, linf, rel_tol=1e-5, abs_tol=1e-5)
        assert math.isclose(r.dot, dot, rel_tol=1e-5, abs_tol=1e-4)
        assert math.isclose(
            r.cosine_dist, 1 - dot / (na * nb), rel_tol=1e-5, abs_tol=1e-5
        )


def test_ann_hard_negatives_excludes_same_label(spark, sf_dir, qs, vecs):
    out = qs["ann_hard_negatives"](spark, sf_dir).collect()
    per = defaultdict(list)
    for r in out:
        assert r.neg_label != r.q_label
        per[r.q_id].append(r)
    assert set(per) == {i for i in vecs if i < 20}
    for q_id, rs in per.items():
        assert [r.rnk for r in sorted(rs, key=lambda r: r.rnk)] == [1, 2, 3, 4, 5]
        qv, ql = vecs[q_id]
        nq = math.sqrt(sum(a * a for a in qv))
        best = []
        for vid, (v, lab) in vecs.items():
            if lab == ql:
                continue
            dot = sum(a * b for a, b in zip(v, qv))
            cos = dot / (math.sqrt(sum(a * a for a in v)) * nq)
            best.append((round(cos, 6), -vid))
        best.sort(reverse=True)
        got = sorted(((r.cosine, -r.neg_id) for r in rs), reverse=True)
        for (c_exp, nid_exp), (c_got, nid_got) in zip(best[:5], got):
            assert math.isclose(c_exp, c_got, abs_tol=2e-6)


def test_min_max_map_rollup_matches_python(spark, sf_dir, qs):
    import json

    out = {r.event_type: r for r in
           qs["min_max_map_rollup"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value", "props").collect()
    mn = defaultdict(dict)
    mx = defaultdict(dict)
    sums = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for e in ev:
        b = json.loads(e.props)["k"] % 10
        c = math.floor(e.value * 100 + 0.5)
        d = mn[e.event_type]
        d[b] = min(d.get(b, c), c)
        d = mx[e.event_type]
        d[b] = max(d.get(b, c), c)
        sums[e.event_type][b][0] += c
        sums[e.event_type][b][1] += 1
    for t, r in out.items():
        keys = sorted(mn[t])
        assert r.keys_csv == ",".join(str(k) for k in keys)
        assert r.mins_csv == ",".join(str(mn[t][k]) for k in keys)
        assert r.maxs_csv == ",".join(str(mx[t][k]) for k in keys)
        am = [str(sums[t][k][0] * 1000000 // sums[t][k][1]) for k in keys]
        assert r.avg_micros_csv == ",".join(am)


def test_gd_linreg_daily_descends_and_matches_numpy(spark, sf_dir, qs):
    out = qs["gd_linreg_daily"](spark, sf_dir).collect()
    assert [r.iter for r in out] == list(range(6))
    mses = [r.mse_mega for r in out]
    # GD at this lr strictly reduces loss on this quadratic
    assert all(a >= b for a, b in zip(mses, mses[1:]))
    # replay the same closed-form GD in numpy
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice").collect()
    daily = defaultdict(int)
    for r in o:
        daily[r.o_orderdate.date()] += round(r.o_totalprice * 100)
    d0, d1 = min(daily), max(daily)
    dd = (d1 - d0).days
    n = len(daily)
    pts = [((d - d0).days / dd, c / 100.0) for d, c in daily.items()]
    st = sum(t for t, _ in pts)
    sy = sum(y for _, y in pts)
    stt = sum(t * t for t, _ in pts)
    sty = sum(t * y for t, y in pts)
    w0 = w1 = 0.0
    for r in out:
        if r.iter > 0:
            w0, w1 = (
                w0 - 0.5 * (2.0 * (w0 * n + w1 * st - sy) / n),
                w1 - 0.5 * (2.0 * (w0 * st + w1 * stt - sty) / n),
            )
        assert math.isclose(r.w0, w0, rel_tol=1e-6, abs_tol=1e-3)
        assert math.isclose(r.w1, w1, rel_tol=1e-6, abs_tol=1e-3)
