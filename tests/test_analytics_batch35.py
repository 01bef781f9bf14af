"""Round-3 wave 8: skewPop/kurtPop moments, simpleLinearRegression,
groupUniqArray, and corrMatrix. Pure-Python recomputes keep both
engines honest."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_moments_skew_kurt_matches_python(spark, sf_dir, qs):
    rows = {r.event_type: r for r in
            qs["moments_skew_kurt"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    per = defaultdict(list)
    for e in ev:
        # engines round HALF_UP; Python's round() is half-even
        per[e.event_type].append(math.floor(e.value * 10 + 0.5))
    assert set(rows) == set(per)
    for t, ws in per.items():
        r = rows[t]
        n = len(ws)
        mean = sum(ws) / n
        m2 = sum(w * w for w in ws) / n - mean * mean
        m3c = sum((w - mean) ** 3 for w in ws) / n
        m4c = sum((w - mean) ** 4 for w in ws) / n
        assert r.n == n
        assert math.isclose(r.mean_w, mean, rel_tol=1e-12)
        assert math.isclose(r.m2, m2, rel_tol=1e-9)
        assert math.isclose(r.skew_pop, m3c / m2 ** 1.5, rel_tol=1e-6)
        assert math.isclose(r.kurt_pop, m4c / m2 ** 2, rel_tol=1e-6)


def test_simple_linreg_daily_matches_lstsq(spark, sf_dir, qs):
    from datetime import date

    rows = {r.event_type: r for r in
            qs["simple_linreg_daily"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value").collect()
    daily = defaultdict(lambda: defaultdict(int))
    epoch = date(2024, 1, 1)
    for e in ev:
        daily[e.event_type][(e.ts.date() - epoch).days] += round(e.value * 100)
    for t, d in daily.items():
        xs, ys = zip(*sorted(d.items()))
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        inter = (sy - slope * sx) / n
        r = rows[t]
        assert r.n_days == n
        assert math.isclose(r.slope_cents_per_day, slope, rel_tol=1e-9)
        assert math.isclose(r.intercept_cents, inter, rel_tol=1e-9)
        # the fit actually predicts: residual mean is ~0 by construction
        resid = sum(y - (slope * x + inter) for x, y in zip(xs, ys))
        assert abs(resid) < 1e-3 * max(abs(v) for v in ys)


def test_group_uniq_array_daily_sorted_distinct(spark, sf_dir, qs):
    rows = {r.day: r for r in
            qs["group_uniq_array_daily"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    per = defaultdict(set)
    for e in ev:
        per[e.ts.date()].add(e.event_type)
    assert set(rows) == set(per)
    for day, types in per.items():
        r = rows[day]
        want = sorted(types)
        assert r.n_uniq == len(want)
        assert r.uniq_types == ",".join(want)
        assert r.uniq_types_3 == ",".join(want[:3])


def test_corr_matrix_lineitem_matches_numpy(spark, sf_dir, qs):
    import numpy as np

    rows = {(r.col_a, r.col_b): r.corr for r in
            qs["corr_matrix_lineitem"](spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
    m = np.array([
        [int(x.l_quantity), round(x.l_extendedprice * 100),
         round(x.l_discount * 100), round(x.l_tax * 100)]
        for x in li
    ], dtype=np.float64)
    names = ["quantity", "extendedprice_cents", "discount_bp", "tax_bp"]
    c = np.corrcoef(m.T)
    assert len(rows) == 6
    for i in range(4):
        for j in range(i + 1, 4):
            key = tuple(sorted([names[i], names[j]]))
            got = rows.get((names[i], names[j])) or rows.get(key)
            assert got is not None
            assert math.isclose(got, c[i, j], rel_tol=1e-9, abs_tol=1e-9)
    # synthetic measures are independent: every |corr| is small
    assert all(-1.0 <= v <= 1.0 for v in rows.values())
    assert all(abs(v) < 0.2 for v in rows.values())
