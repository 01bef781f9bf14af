"""Round-3 wave 15: sliding-window exact distinct (explode-to-window)
and sequenceMatch negation. Pure-Python recomputes keep both engines
honest."""

from __future__ import annotations

from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_sliding_distinct_users_matches_python(spark, sf_dir, qs):
    import datetime

    out = {r.win_end: r for r in
           qs["sliding_distinct_users"](spark, sf_dir).collect()}
    by_day = defaultdict(set)
    for r in read_table(spark, sf_dir, "events").select(
            "user_id", "ts").collect():
        by_day[r.ts.date()].add(r.user_id)
    mx = max(by_day)
    days = set()
    for d in by_day:
        for k in range(7):
            e = d + datetime.timedelta(days=k)
            if e <= mx:
                days.add(e)
    assert set(out) == days
    for e in days:
        users = set()
        for k in range(7):
            users |= by_day.get(e - datetime.timedelta(days=k), set())
        r = out[e]
        assert r.users_7d == len(users)
        assert r.users_1d == len(by_day.get(e, set()))
        # trailing window dominates the single day
        assert r.users_7d >= r.users_1d


def test_sequence_match_negation_matches_python(spark, sf_dir, qs):
    import calendar

    r = qs["sequence_match_negation"](spark, sf_dir).collect()[0]
    per = defaultdict(list)
    for e in read_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type").collect():
        per[e.user_id].append(
            (calendar.timegm(e.ts.timetuple()), e.event_id, e.event_type)
        )
    n_p = n_q = 0
    for evs in per.values():
        evs.sort()
        t = [x[2] for x in evs]
        p = q = False
        last_view = last_error = 0
        for j, typ in enumerate(t, start=1):
            if typ == "purchase":
                if last_view:
                    p = True
                    if last_error < last_view:
                        q = True
            elif typ == "view":
                last_view = j
            elif typ == "error":
                last_error = j
        n_p += p
        n_q += q
    assert r.n_users == len(per)
    assert r.n_view_then_purchase == n_p
    assert r.n_without_error_between == n_q
    assert r.n_rejected_by_error_guard == n_p - n_q
    # the negation guard must strictly tighten on this corpus
    assert r.n_without_error_between <= r.n_view_then_purchase
