"""Round-3 wave 1: AggregatingMergeTree -State/-Merge, the -Resample
combinator, GraphiteMergeTree age-based rollup, and PASTE JOIN.
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
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events").select(
        "event_type", "ts", "user_id", "value"
    ).collect()


def test_aggregating_merge_states_flags_and_counts(spark, sf_dir, qs, events):
    rows = {r.event_type: r for r in
            qs["aggregating_merge_states"](spark, sf_dir).collect()}
    n = defaultdict(int)
    users = defaultdict(set)
    days = defaultdict(set)
    vmax = {}
    for e in events:
        n[e.event_type] += 1
        users[e.event_type].add(e.user_id)
        days[e.event_type].add(e.ts.date())
        v = round(e.value, 6)
        if e.event_type not in vmax or v > vmax[e.event_type]:
            vmax[e.event_type] = v
    assert set(rows) == set(n)
    for t, r in rows.items():
        # merge-of-partials must equal the direct aggregate, always
        assert r.n_ok == 1 and r.sum_ok == 1 and r.uniq_ok == 1
        assert r.merged_n == n[t]
        assert r.merged_uniq == len(users[t])
        assert r.n_states == len(days[t])
        assert math.isclose(r.merged_max, vmax[t], rel_tol=1e-9)


def test_agg_resample_combinator_buckets(spark, sf_dir, qs, events):
    out = qs["agg_resample_combinator"](spark, sf_dir).collect()
    per_type = defaultdict(list)
    for r in out:
        per_type[r.event_type].append(r)
    counts = defaultdict(int)
    in_range = defaultdict(int)
    for e in events:
        if 0 <= e.value < 500:
            counts[(e.event_type, int(e.value // 50))] += 1
            in_range[e.event_type] += 1
    for t, rs in per_type.items():
        # the combinator emits the FULL fixed-length bucket axis
        assert [r.bucket for r in sorted(rs, key=lambda r: r.bucket)] == list(
            range(10)
        )
        for r in rs:
            assert r.bucket_lo == r.bucket * 50
            assert r.bucket_hi == r.bucket * 50 + 50
            assert r.n_rows == counts[(t, r.bucket)]
        assert sum(r.n_rows for r in rs) == in_range[t]


def test_graphite_rollup_grains(spark, sf_dir, qs, events):
    out = qs["graphite_rollup"](spark, sf_dir).collect()
    ref = max(e.ts.date() for e in events)
    total = 0
    agg = defaultdict(lambda: [0, 0.0])
    for e in events:
        day = e.ts.date()
        age = (ref - day).days
        if age <= 7:
            grain, bucket = "day", day
        elif age <= 21:
            import datetime

            grain = "week"
            bucket = day - datetime.timedelta(days=day.weekday())
        else:
            grain, bucket = "month", day.replace(day=1)
        k = (e.event_type, grain, bucket)
        agg[k][0] += 1
        agg[k][1] += round(e.value, 6)
    for r in out:
        k = (r.event_type, r.grain, r.bucket_start)
        assert k in agg, k
        assert r.n_raw == agg[k][0]
        assert math.isclose(
            r.avg_value, agg[k][1] / agg[k][0], rel_tol=1e-6, abs_tol=1e-6
        )
        total += r.n_raw
    assert total == len(events)
    assert len(out) == len(agg)


def test_paste_join_daily_positional(spark, sf_dir, qs):
    out = qs["paste_join_daily"](spark, sf_dir).collect()
    n = len(out)
    assert [r.rn for r in out] == list(range(1, n + 1))
    # side B is revenue-descending; side A date-ascending over same days
    ranked = [r.rev_ranked for r in out]
    assert all(a >= b for a, b in zip(ranked, ranked[1:]))
    dates_a = sorted(r.date_asc for r in out)
    assert dates_a == [r.date_asc for r in out]
    assert set(r.date_by_rank for r in out) == set(r.date_asc for r in out)
    # the multiset of revenues is identical on both sides
    assert sorted(r.rev_asc for r in out) == sorted(ranked)
