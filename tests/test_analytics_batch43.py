"""Round-3 wave 9: PERCENTILE.INC/EXC quantiles and the age() full-unit
family. Pure-Python recomputes (numpy quantile as reference for the
inclusive method) keep both engines honest."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_quantiles_inclusive_matches_numpy(spark, sf_dir, qs):
    import numpy as np

    out = {r.c_mktsegment: r for r in
           qs["quantiles_exclusive_inclusive"](spark, sf_dir).collect()}
    per = defaultdict(list)
    for r in read_table(spark, sf_dir, "customer").select(
            "c_mktsegment", "c_acctbal").collect():
        per[r.c_mktsegment].append(round(r.c_acctbal * 100))
    assert set(out) == set(per)
    for seg, cents in per.items():
        a = np.array(sorted(cents), dtype=float)
        r = out[seg]
        assert r.n == len(cents)
        # inclusive == numpy's default 'linear' (Excel PERCENTILE.INC)
        for q, got in ((0.25, r.q25_inc), (0.5, r.q50_inc),
                       (0.75, r.q75_inc)):
            assert math.isclose(
                got, float(np.quantile(a, q)) / 100.0, abs_tol=1e-4
            )
        # exclusive == numpy method='weibull' (Excel PERCENTILE.EXC)
        for q, got in ((0.25, r.q25_exc), (0.5, r.q50_exc),
                       (0.75, r.q75_exc)):
            want = float(np.quantile(a, q, method="weibull")) / 100.0
            assert math.isclose(got, want, abs_tol=1e-4)
        # q50 agrees between the two methods (h differs but both land on
        # the median for symmetric ranks) only when n is odd; always the
        # exclusive quartiles are at least as extreme as the inclusive
        assert r.q25_exc <= r.q25_inc + 1e-9
        assert r.q75_exc >= r.q75_inc - 1e-9


def test_age_unit_family_matches_python(spark, sf_dir, qs):
    out = {r.o_orderpriority: r for r in
           qs["age_unit_family"](spark, sf_dir).collect()}
    orders = {r.o_orderkey: (r.o_orderpriority, r.o_orderdate.date())
              for r in read_table(spark, sf_dir, "orders").select(
                  "o_orderkey", "o_orderpriority", "o_orderdate").collect()}
    last = {}
    for r in read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate").collect():
        d = r.l_shipdate.date()
        if r.l_orderkey not in last or d > last[r.l_orderkey]:
            last[r.l_orderkey] = d
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for ok, (prio, d1) in orders.items():
        if ok not in last:
            continue
        d2 = max(last[ok], d1)
        days = (d2 - d1).days
        months = (d2.year - d1.year) * 12 + (d2.month - d1.month) - (
            1 if d2.day < d1.day else 0
        )
        a = agg[prio]
        a[0] += 1
        a[1] += days
        a[2] += days // 7
        a[3] += months
        a[4] = max(a[4], days)
    assert set(out) == set(agg)
    for prio, (n, sd, sw, sm, mx) in agg.items():
        r = out[prio]
        assert r.n == n
        assert r.avg_age_days_milli == sd * 1000 // n
        assert r.avg_age_weeks_milli == sw * 1000 // n
        assert r.avg_age_months_milli == sm * 1000 // n
        assert r.max_age_days == mx
