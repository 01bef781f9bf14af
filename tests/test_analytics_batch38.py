"""Round-3 wave 3: timeSlots expansion, quantileTiming buckets, LIMIT
WITH TIES, set-operator census, and the date-format family.
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


def test_time_slots_expansion_matches_python(spark, sf_dir, qs):
    out = {r.slot_epoch: r for r in
           qs["time_slots_expansion"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "ts", "user_id", "value").collect()
    import calendar

    slots = defaultdict(lambda: [0, set()])
    for e in ev:
        u = calendar.timegm(e.ts.timetuple())
        dur = math.floor(e.value)
        s = (u // 1800) * 1800
        last = ((u + dur) // 1800) * 1800
        while s <= last:
            slots[s][0] += 1
            slots[s][1].add(e.user_id)
            s += 1800
    assert set(out) == set(slots)
    for s, (n, users) in slots.items():
        assert out[s].n_events == n
        assert out[s].n_users == len(users)


def test_quantile_timing_buckets_matches_python(spark, sf_dir, qs):
    out = {r.event_type: r for r in
           qs["quantile_timing_buckets"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    per = defaultdict(list)
    for e in ev:
        ms = math.floor(e.value * 100 + 0.5)
        b = ms if ms < 1024 else (ms - ms % 16 if ms <= 30000 else 30000)
        per[e.event_type].append(b)
    for t, bs in per.items():
        bs.sort()
        n = len(bs)
        r = out[t]
        assert r.n == n
        assert r.n_clamped == sum(1 for b in bs if b == 30000)
        for q, got in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            assert got == bs[math.ceil(q * n) - 1]


def test_top_customers_with_ties_keeps_tie_group(spark, sf_dir, qs):
    out = qs["top_customers_with_ties"](spark, sf_dir).collect()
    per = defaultdict(int)
    for r in read_table(spark, sf_dir, "orders").select(
            "o_custkey").collect():
        per[r.o_custkey] += 1
    counts = sorted(per.values(), reverse=True)
    tenth = counts[9]
    expected = [(k, n) for k, n in per.items() if n >= tenth]
    assert len(out) == len(expected)
    # WITH TIES: strictly more than 10 rows whenever the 10th value ties
    if counts.count(tenth) > counts[:10].count(tenth) or counts[:10].count(
            tenth) > 1:
        assert len(out) >= 10
    got = {(r.custkey, r.n_orders) for r in out}
    assert got == set(expected)
    assert all(r.rnk <= 10 for r in out)


def test_set_ops_customers_identities(spark, sf_dir, qs):
    r = qs["set_ops_customers"](spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate").collect()
    a = {x.o_custkey for x in o if x.o_orderdate.year == 1996}
    b = {x.o_custkey for x in o if x.o_orderdate.year == 1997}
    assert r.n_1996 == len(a) and r.n_1997 == len(b)
    assert r.n_both == len(a & b)
    assert r.n_only_1996 == len(a - b) and r.n_only_1997 == len(b - a)
    assert r.n_union == len(a | b)
    assert r.n_symdiff == len(a ^ b)
    assert r.min_only_1996 == min(a - b)
    assert r.min_only_1997 == min(b - a)


def test_date_format_family_labels(spark, sf_dir, qs):
    out = qs["date_format_family"](spark, sf_dir).collect()
    per = defaultdict(int)
    for r in read_table(spark, sf_dir, "orders").select(
            "o_orderdate").collect():
        d = r.o_orderdate.date()
        per[(d.year, d.month)] += 1
    assert len(out) == len(per)
    import calendar

    for r in out:
        y, m = divmod(r.yyyymm, 100)
        assert per[(y, m)] == r.n_orders
        assert r.month_start.year == y and r.month_start.month == m
        assert r.month_name == calendar.month_name[m]
        assert r.first_dow_name == calendar.day_name[r.month_start.weekday()]
        assert r.iso_week_of_first == r.month_start.isocalendar()[1]
        assert r.quarter_label == f"Q{(m - 1) // 3 + 1}-{y}"
