"""Round-3 wave 16: windowFunnel strict_dedup, dictGetHierarchy/
dictIsIn, and rolling 30-day OLS beta. Pure-Python recomputes keep
both engines honest."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_window_funnel_dedup_matches_python(spark, sf_dir, qs):
    out = {r.funnel_level: r.n_users for r in
           qs["window_funnel_dedup"](spark, sf_dir).collect()}
    per = defaultdict(list)
    for e in read_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type").collect():
        per[e.user_id].append((e.ts, e.event_id, e.event_type))
    day_us = 24 * 3600
    levels = defaultdict(int)
    for evs in per.values():
        evs.sort()
        t = [x[2] for x in evs]
        ts = [x[0] for x in evs]
        best = 0
        for i, typ in enumerate(t):
            if typ != "view":
                continue
            lvl = 1
            matched = {"view"}
            for j in range(i + 1, len(t)):
                if (ts[j] - ts[i]).total_seconds() > day_us:
                    break
                if lvl == 1 and t[j] == "click":
                    lvl = 2
                    matched.add("click")
                elif lvl == 2 and t[j] == "purchase":
                    lvl = 3
                    break
                elif t[j] in matched:
                    break  # strict_dedup: repeat of a matched step aborts
            best = max(best, lvl)
        levels[best] += 1
    assert out == dict(levels)
    assert sum(out.values()) == len(per)


def test_dict_hierarchy_report_matches_python(spark, sf_dir, qs):
    out = {r.nationkey: r for r in
           qs["dict_hierarchy_report"](spark, sf_dir).collect()}
    regions = {r.r_regionkey: r.r_name for r in read_table(
        spark, sf_dir, "region").collect()}
    nations = read_table(spark, sf_dir, "nation").collect()
    assert len(out) == len(nations)
    for n in nations:
        r = out[n.n_nationkey]
        assert r.name_chain == f"{n.n_name}>{regions[n.n_regionkey]}"
        assert r.id_path == f"{n.n_nationkey},{n.n_regionkey + 100}"
        assert r.is_in_europe == int(regions[n.n_regionkey] == "EUROPE")
        assert r.depth == 2


def test_rolling_beta_30d_matches_python(spark, sf_dir, qs):
    import datetime

    out = {r.day: r.beta_cents_per_day for r in
           qs["rolling_beta_30d"](spark, sf_dir).collect()}
    daily = defaultdict(int)
    for r in read_table(spark, sf_dir, "orders").select(
            "o_orderdate", "o_totalprice").collect():
        daily[r.o_orderdate.date()] += round(r.o_totalprice * 100)
    days = sorted(daily)
    epoch = datetime.date(1992, 1, 1)
    assert len(out) == len(days) - 29
    for i in range(29, len(days)):
        frame = days[i - 29:i + 1]
        xs = [(d - epoch).days for d in frame]
        ys = [daily[d] for d in frame]
        n = 30
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert math.isclose(out[days[i]], beta, rel_tol=1e-6, abs_tol=1e-4)
