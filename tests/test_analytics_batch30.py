"""Round-3 wave 3: editDistance parity, SummingMergeTree /
VersionedCollapsingMergeTree merge semantics, and one-way ANOVA.
Python recomputes keep both engines honest."""

from __future__ import annotations

import math

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_matches_reference_dp(spark, sf_dir, qs):
    rows = qs["edit_distance_names"](spark, sf_dir).collect()
    names = sorted(
        r.p_name
        for r in read_table(spark, sf_dir, "part").select("p_name").distinct().collect()
    )
    expect = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            d = _levenshtein(a, b)
            if d <= 8:
                expect[(a, b)] = d
    got = {(r.name_a, r.name_b): r.edit_dist for r in rows}
    assert got == expect
    for r in rows:
        sim = 1.0 - r.edit_dist / max(len(r.name_a), len(r.name_b))
        assert math.isclose(r.name_sim, round(sim, 6), abs_tol=1e-9)


def test_summing_merge_conserves_rows_and_value(spark, sf_dir, qs):
    rows = qs["summing_merge_compaction"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id", "event_type"
    ).collect()
    from collections import defaultdict

    per_key = defaultdict(list)
    for e in ev:
        per_key[(e.user_id, e.ts.date())].append(e)
    by_day = defaultdict(lambda: [0, 0, 0.0, 0])  # keys, rows, value, purch
    for (u, day), es in per_key.items():
        s = by_day[day]
        s[0] += 1
        s[1] += len(es)
        s[2] += sum(round(e.value, 6) for e in es)
        last = max(es, key=lambda e: e.event_id)
        s[3] += last.event_type == "purchase"
    assert {r.day for r in rows} == set(by_day)
    for r in rows:
        keys, nrows, val, purch = by_day[r.day]
        assert r.n_keys == keys
        assert r.rows_before == nrows
        assert r.rows_merged == nrows - keys
        assert r.keys_last_purchase == purch
        assert math.isclose(r.day_value, round(val, 4), abs_tol=1e-3)


def test_versioned_collapsing_exactly_one_survivor_per_user(spark, sf_dir, qs):
    rows = qs["versioned_collapsing_audit"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    from collections import defaultdict

    streams = defaultdict(list)
    for e in ev:
        streams[e.user_id].append(e)
    n_users = 0
    expect = defaultdict(lambda: [0, 0, 0, 0])
    for u, es in streams.items():
        es.sort(key=lambda e: (e.ts, e.event_id))
        n = len(es)
        n_users += 1
        s = expect[es[-1].event_type]  # survivor = last state
        s[0] += 1
        s[1] += 2 * n - 1  # CDC rows: n inserts + (n-1) cancels
        s[2] += n - 1  # cancelled versions
        s[3] += 1  # exactly one survivor
    assert {r.surviving_type for r in rows} == set(expect)
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        users, written, cancelled, surv = expect[r.surviving_type]
        assert r.n_users == users
        assert r.cdc_rows_written == written
        assert r.versions_cancelled == cancelled
        assert r.rows_surviving == surv
        assert r.write_amp_ppm == math.floor(written * 1000000 / surv)


def test_anova_matches_plain_float_recompute(spark, sf_dir, qs):
    r = qs["anova_price_segments"](spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").collect()
    seg_of = {x.c_custkey: x.c_mktsegment for x in c}
    from collections import defaultdict

    groups = defaultdict(list)
    for x in o:
        if x.o_custkey in seg_of:
            groups[seg_of[x.o_custkey]].append(round(x.o_totalprice * 100) / 100)
    vals = [v for g in groups.values() for v in g]
    n, k = len(vals), len(groups)
    grand = sum(vals) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw = sum(sum((v - sum(g) / len(g)) ** 2 for v in g) for g in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.k_groups == k and r.n_total == n
    # query output is rounded to 1e-6 — compare on that grid
    assert math.isclose(r.f_stat, f, rel_tol=1e-5, abs_tol=2e-6)
    assert math.isclose(r.eta_sq, ssb / (ssb + ssw), abs_tol=2e-6)
    assert 0.0 <= r.eta_sq <= 1.0
