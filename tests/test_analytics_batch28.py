"""Round-3 wave 1: ClickHouse function parity — theilsU/contingency,
studentTTest, sequenceNextNode, uniqUpTo, deltaSum/runningDifference,
sparkbar, geohashEncode. Each test recomputes the semantics in plain
Python over the fixture tables (independent of both engines)."""

from __future__ import annotations

import math

import pytest

from clickhouse_forecasting_spark.queries import (
    SPARK_QUERIES,
    _GEOHASH_ALPHABET,
    _SPARKBAR_PALETTE,
)
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_theils_u_matches_python_entropies(spark, sf_dir, qs):
    row = qs["theils_u_association"](spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    from collections import Counter

    xy = Counter((o.o_orderpriority, o.o_orderstatus) for o in orders)
    cx = Counter(o.o_orderpriority for o in orders)
    cy = Counter(o.o_orderstatus for o in orders)
    n = len(orders)
    h = lambda c: -sum((v / n) * math.log(v / n) for v in c.values())  # noqa: E731
    hx, hy, hxy = h(cx), h(cy), h(xy)
    assert row.n_orders == n
    assert abs(row.h_priority - hx) < 1e-6
    assert abs(row.h_status - hy) < 1e-6
    assert abs(row.h_joint - hxy) < 1e-6
    # U in [0,1]; H(X|Y) = H(XY) - H(Y)
    u_xy = (hx - (hxy - hy)) / hx
    assert abs(row.u_priority_given_status - u_xy) < 1e-6
    assert 0.0 <= row.u_priority_given_status <= 1.0
    assert 0.0 <= row.u_status_given_priority <= 1.0
    chi2 = sum(
        (c - cx[x] * cy[y] / n) ** 2 / (cx[x] * cy[y] / n)
        for (x, y), c in xy.items()
    )
    assert abs(row.chi2 - chi2) < 1e-4
    assert abs(row.contingency_c - math.sqrt(chi2 / (chi2 + n))) < 1e-6


def test_student_ttest_matches_python(spark, sf_dir, qs):
    row = qs["student_ttest_segments"](spark, sf_dir).collect()[0]
    cust = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    ).collect()
    a = [round(c.c_acctbal, 2) for c in cust if c.c_mktsegment == "BUILDING"]
    b = [round(c.c_acctbal, 2) for c in cust if c.c_mktsegment == "MACHINERY"]
    n1, n2 = len(a), len(b)
    m1, m2 = sum(a) / n1, sum(b) / n2
    ssd = sum((x - m1) ** 2 for x in a) + sum((x - m2) ** 2 for x in b)
    pooled = ssd / (n1 + n2 - 2)
    t = (m1 - m2) / math.sqrt(pooled * (1 / n1 + 1 / n2))
    assert (row.n_building, row.n_machinery) == (n1, n2)
    assert abs(row.mean_building - m1) < 1e-4
    assert abs(row.mean_machinery - m2) < 1e-4
    assert abs(row.pooled_var - pooled) < 1e-2
    assert abs(row.t_stat - t) < 1e-4
    assert row.df == n1 + n2 - 2
    assert row.significant_5pct == int(abs(t) > 1.96)


def test_sequence_next_node_matches_python(spark, sf_dir, qs):
    rows = {
        r.next_after_first_view: r.n_users
        for r in qs["sequence_next_node"](spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    from collections import Counter

    expect: Counter = Counter()
    for seq in by_user.values():
        seq.sort(key=lambda e: (e.ts, e.event_id))
        for i, e in enumerate(seq):
            if e.event_type == "view":
                nxt = seq[i + 1].event_type if i + 1 < len(seq) else "(end)"
                expect[nxt] += 1
                break
    assert rows == dict(expect)
    # every user with >=1 view is accounted exactly once
    users_with_view = sum(
        1 for seq in by_user.values() if any(e.event_type == "view" for e in seq)
    )
    assert sum(rows.values()) == users_with_view


def test_uniq_up_to_caps_exact_counts(spark, sf_dir, qs):
    rows = qs["uniq_up_to_report"](spark, sf_dir).collect()
    assert len(rows) == 5  # five event types in fixtures
    for r in rows:
        assert r.uniq_up_to_10 == min(r.exact_users, 11)
        assert r.uniq_up_to_100 == min(r.exact_users, 101)
        assert r.capped_at_100 == int(r.exact_users > 100)
        assert r.exact_users <= r.n_events


def test_delta_sum_matches_python(spark, sf_dir, qs):
    rows = {r.month: r for r in qs["delta_sum_report"](spark, sf_dir).collect()}
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    from collections import defaultdict
    from decimal import Decimal

    daily: dict = defaultdict(Decimal)
    for o in orders:
        d = o.o_orderdate.date() if hasattr(o.o_orderdate, "date") else o.o_orderdate
        daily[d] += Decimal(str(round(o.o_totalprice, 2)))
    months: dict = defaultdict(list)
    for d in sorted(daily):
        months[d.strftime("%Y-%m")].append(daily[d])
    for mo, vals in months.items():
        r = rows[mo]
        deltas = [b - a for a, b in zip(vals, vals[1:])]
        assert r.n_days == len(vals)
        assert abs(r.delta_sum - float(sum(d for d in deltas if d > 0))) < 1e-6
        assert r.up_days == sum(1 for d in deltas if d > 0)
        assert r.down_days == sum(1 for d in deltas if d < 0)
        assert abs(r.net_change - float(vals[-1] - vals[0])) < 1e-6


def test_sparkbar_levels_and_shape(spark, sf_dir, qs):
    rows = qs["sparkbar_monthly_orders"](spark, sf_dir).collect()
    palette = set(_SPARKBAR_PALETTE)
    for r in rows:
        bar = r.sparkbar
        assert len(bar) == r.n_days <= 31
        assert set(bar) <= palette
        if r.min_daily < r.max_daily:
            # the min day renders the lowest level, the max day the highest
            assert _SPARKBAR_PALETTE[0] in bar
            assert _SPARKBAR_PALETTE[7] in bar
        else:
            assert set(bar) == {_SPARKBAR_PALETTE[7]}


def _geohash_ref(lat: float, lon: float, precision: int) -> str:
    """Classic geohash bisection encode — the public algorithm, used to
    prove the bit-interleave formula equals real geohash cells."""
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = [], [], True
    while len(out) < precision:
        if even:
            mid = (lon_rng[0] + lon_rng[1]) / 2
            bits.append(1 if lon >= mid else 0)
            lon_rng[0 if lon >= mid else 1] = mid
        else:
            mid = (lat_rng[0] + lat_rng[1]) / 2
            bits.append(1 if lat >= mid else 0)
            lat_rng[0 if lat >= mid else 1] = mid
        even = not even
        if len(bits) == 5:
            out.append(_GEOHASH_ALPHABET[int("".join(map(str, bits)), 2)])
            bits = []
    return "".join(out)


def test_geohash_cells_match_reference_algorithm(spark, sf_dir, qs):
    rows = qs["geohash_grid_rollup"](spark, sf_dir).collect()
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).collect()
    from collections import Counter

    expect: Counter = Counter()
    for c in cust:
        lat = ((c.c_custkey * 37) % 18000) / 100.0 - 90.0
        lon = ((c.c_custkey * 73) % 36000) / 100.0 - 180.0
        expect[_geohash_ref(lat, lon, 2)] += 1
    got = {r.geohash2: r.n_customers for r in rows}
    assert got == dict(expect)
    assert sum(got.values()) == len(cust)
    assert all(len(g) == 2 and set(g) <= set(_GEOHASH_ALPHABET) for g in got)
