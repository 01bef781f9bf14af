"""Round-3 wave 5: pointInPolygon, boundingRatio, contingency /
bias-corrected Cramér's V, and WITH FILL INTERPOLATE. Python
recomputes keep both engines honest."""

from __future__ import annotations

import math

import pytest

from clickhouse_forecasting_spark.queries import _PIP_POLY, SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def _inside(px: float, py: float) -> bool:
    # matplotlib-free reference ray cast (float ok for the reference —
    # grid coords are integers well inside float exactness)
    n = len(_PIP_POLY)
    c = False
    for i in range(n):
        x1, y1 = _PIP_POLY[i]
        x2, y2 = _PIP_POLY[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < x1 + (x2 - x1) * (py - y1) / (y2 - y1):
            c = not c
    return c


def test_point_in_polygon_matches_reference_raycast(spark, sf_dir, qs):
    rows = {r.nation: r for r in qs["point_in_polygon_sites"](spark, sf_dir).collect()}
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).collect()
    nat = {n.n_nationkey: n.n_name
           for n in read_table(spark, sf_dir, "nation").collect()}
    from collections import defaultdict

    expect = defaultdict(lambda: [0, 0])
    for c in cust:
        e = expect[nat[c.c_nationkey]]
        e[0] += 1
        e[1] += _inside((c.c_custkey * 37) % 18000, (c.c_custkey * 73) % 36000)
    assert set(rows) == set(expect)
    for name, (n_sites, n_in) in expect.items():
        r = rows[name]
        assert (r.n_sites, r.n_inside) == (n_sites, n_in)
        assert r.inside_ppm == math.floor(n_in * 1000000 / n_sites)


def test_bounding_ratio_is_first_last_slope(spark, sf_dir, qs):
    rows = {r.month: r for r in qs["bounding_ratio_daily"](spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    from collections import defaultdict

    daily = defaultdict(int)
    for x in o:
        daily[x.o_orderdate.date()] += round(x.o_totalprice * 100)
    months = defaultdict(list)
    for d, c in daily.items():
        months[d.strftime("%Y-%m")].append((d, c))
    for m, pts in months.items():
        pts.sort()
        if len(pts) < 2:
            assert m not in rows
            continue
        (d0, c0), (d1, c1) = pts[0], pts[-1]
        slope = (c1 - c0) / 100.0 / (d1 - d0).days
        r = rows[m]
        assert r.n_days == len(pts)
        assert math.isclose(r.bounding_ratio, slope, rel_tol=1e-9, abs_tol=1e-6)


def test_contingency_family_invariants(spark, sf_dir, qs):
    r = qs["contingency_coefficient"](spark, sf_dir).collect()[0]
    # recompute chi2 from the raw table
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority").collect()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").collect()
    seg_of = {x.c_custkey: x.c_mktsegment for x in c}
    from collections import Counter

    cells = Counter((seg_of[x.o_custkey], x.o_orderpriority) for x in o
                    if x.o_custkey in seg_of)
    n = sum(cells.values())
    ri = Counter(); cj = Counter()
    for (s, p), v in cells.items():
        ri[s] += v
        cj[p] += v
    chi2 = sum(
        (v - ri[s] * cj[p] / n) ** 2 / (ri[s] * cj[p] / n)
        for (s, p), v in cells.items()
    )
    assert r.n == n
    assert math.isclose(r.chi2, chi2, rel_tol=1e-6, abs_tol=1e-5)
    phi2 = chi2 / n
    assert math.isclose(r.phi2, phi2, abs_tol=2e-6)
    assert math.isclose(r.contingency_c, math.sqrt(phi2 / (phi2 + 1)), abs_tol=2e-6)
    k, rr = len(ri), len(cj)
    phi2c = max(0.0, phi2 - (k - 1) * (rr - 1) / (n - 1))
    kc = k - (k - 1) ** 2 / (n - 1)
    rc = rr - (rr - 1) ** 2 / (n - 1)
    assert math.isclose(r.cramers_v_bc, math.sqrt(phi2c / min(kc - 1, rc - 1)),
                        abs_tol=2e-6)
    assert 0.0 <= r.cramers_v_bc <= 1.0 and 0.0 <= r.contingency_c < 1.0


def test_with_fill_interpolate_dense_monotone_axis(spark, sf_dir, qs):
    rows = qs["with_fill_interpolate"](spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    from collections import defaultdict
    from datetime import timedelta

    daily = defaultdict(int)
    for x in o:
        daily[x.o_orderdate.date()] += round(x.o_totalprice * 100)
    lo, hi = min(daily), max(daily)
    assert [r.d for r in rows] == [lo + timedelta(days=i)
                                   for i in range((hi - lo).days + 1)]
    obs = sorted(daily)
    for r in rows:
        if not r.filled:
            assert r.revenue == math.floor(daily[r.d] * 1000) / 100000.0
        else:
            assert r.d not in daily
            # interpolated value sits between its neighbors
            prev = max(d for d in obs if d < r.d)
            nxt = min(d for d in obs if d > r.d)
            lovl = min(daily[prev], daily[nxt]) / 100.0
            hivl = max(daily[prev], daily[nxt]) / 100.0
            assert lovl - 1e-6 <= r.revenue <= hivl + 1e-6
            # exact formula
            g = (nxt - prev).days
            k = (r.d - prev).days
            num = daily[prev] * (g - k) + daily[nxt] * k
            assert r.revenue == math.floor(num * 1000 / g) / 100000.0
