"""Semantic invariants for the batch-6 analytics queries (interval
consolidation, first-touch attribution, ratio-to-report shares, YoY
growth). Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table

SPAN_US = 300_000_000
WEEK_US = 7 * 24 * 3600 * 1_000_000


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for seq in by_user.values():
        seq.sort(key=lambda r: (r.us, r.event_id))
    return by_user


def test_interval_merge_matches_python_sweep(spark, sf_dir, qs, events):
    got = {r.user_id: r for r in qs["interval_merge_activity"](spark, sf_dir).collect()}
    assert set(got) == set(events)
    for uid, seq in events.items():
        islands = []
        cur_s = cur_e = None
        for r in seq:
            s, e = r.us, r.us + SPAN_US
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append((cur_s, cur_e))
        g = got[uid]
        assert g.n_islands == len(islands)
        assert g.total_active_us == sum(e - s for s, e in islands)
        assert g.max_island_us == max(e - s for s, e in islands)


def test_attribution_counts_and_latency(spark, sf_dir, qs, events):
    rows = qs["attribution_first_touch"](spark, sf_dir).collect()
    # python reference over the same event log
    purchases = attributed = 0
    lat_sum = 0
    for seq in events.values():
        clicks = [r.us for r in seq if r.event_type == "click"]
        for r in seq:
            if r.event_type != "purchase":
                continue
            purchases += 1
            window_clicks = [c for c in clicks if r.us - WEEK_US <= c <= r.us]
            if window_clicks:
                attributed += 1
                lat_sum += r.us - min(window_clicks)
    assert sum(r.n_purchases for r in rows) == purchases
    assert sum(r.n_attributed for r in rows) == attributed
    for r in rows:
        assert 0 <= r.n_attributed <= r.n_purchases
        if r.n_attributed:
            assert r.avg_latency_us >= 0


def test_revenue_shares_sum_to_one_million_or_less(spark, sf_dir, qs):
    rows = qs["nation_revenue_share"](spark, sf_dir).collect()
    assert rows
    by_region: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.share_ppm <= 1_000_000
        by_region.setdefault(r.r_name, []).append(r)
    for region, nations in by_region.items():
        total = sum(r.share_ppm for r in nations)
        # integer floor loses at most 1 ppm per nation
        assert 1_000_000 - len(nations) <= total <= 1_000_000, region


def test_dau_wau_matches_python_sets(spark, sf_dir, qs):
    import datetime

    rows = {r.d: r for r in qs["dau_wau_stickiness"](spark, sf_dir).collect()}
    assert rows
    ev = (
        read_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .collect()
    )
    by_day: dict[datetime.date, set] = {}
    for r in ev:
        by_day.setdefault(r.d, set()).add(r.user_id)
    for d, users in by_day.items():
        r = rows[d]
        assert r.dau == len(users)
        wau = set()
        for k in range(7):
            wau |= by_day.get(d - datetime.timedelta(days=k), set())
        assert r.wau == len(wau)
        assert r.stickiness_ppm == (r.dau * 1_000_000) // r.wau
        assert r.dau <= r.wau
    assert set(rows) == set(by_day)  # zero-DAU days are filtered, none exist


def test_topn_with_others_partitions_all_orders(spark, sf_dir, qs):
    rows = qs["priority_topn_with_others"](spark, sf_dir).collect()
    total = sum(r.n_orders for r in rows)
    assert total == read_table(spark, sf_dir, "orders").count()
    by_year: dict[int, list] = {}
    for r in rows:
        by_year.setdefault(r.yr, []).append(r)
    for yr, buckets in by_year.items():
        named = [b for b in buckets if b.bucket != "OTHER"]
        other = [b for b in buckets if b.bucket == "OTHER"]
        assert len(named) <= 2
        assert len(other) <= 1
        if other:
            # every named bucket beats (or ties into, broken by name) OTHER's
            # single largest constituent — implied by top-2 cut: each named
            # count >= any OTHER constituent, so >= OTHER avg
            assert all(
                b.n_orders >= other[0].n_orders / other[0].n_priorities
                for b in named
            )


def test_window_showcase_internal_consistency(spark, sf_dir, qs):
    rows = qs["window_function_showcase"](spark, sf_dir).collect()
    assert rows
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg, rs in by_seg.items():
        rs.sort(key=lambda r: (-r.rev_cents, r.c_custkey))
        n = len(rs)
        leader = rs[0].rev_cents
        for i, r in enumerate(rs):
            assert r.rnk == i + 1  # total order => rank == row position
            assert r.leader_cents == leader
            assert r.gap_to_leader == leader - r.rev_cents
            if n > 1:
                assert r.pct_rank == pytest.approx(i / (n - 1), abs=1e-6)
            assert r.cume == pytest.approx((i + 1) / n, abs=1e-6)
            if i >= 1:
                assert r.runnerup_cents == rs[1].rev_cents
            else:
                assert r.runnerup_cents is None


def test_sql_api_report_top3_per_month(spark, sf_dir, qs):
    rows = qs["sql_api_monthly_leaders"](spark, sf_dir).collect()
    assert rows
    by_mo: dict = {}
    for r in rows:
        by_mo.setdefault(r.mo, []).append(r.gross)
    for mo, gs in by_mo.items():
        assert 1 <= len(gs) <= 3
        assert gs == sorted(gs, reverse=True) or len(set(gs)) < len(gs)


def test_yoy_growth_reconstructs_revenue(spark, sf_dir, qs):
    rows = sorted(qs["yoy_revenue_growth"](spark, sf_dir).collect(), key=lambda r: r.yr)
    assert rows
    assert rows[0].prev_cents is None and rows[0].growth_bp is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.prev_cents == prev.rev_cents
        want_bp = (cur.rev_cents - cur.prev_cents) * 10000
        trunc = int(want_bp / cur.prev_cents)  # truncation toward zero
        assert cur.growth_bp == trunc
