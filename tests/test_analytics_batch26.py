"""Semantic invariants for the batch-26 governance/attribution queries
(k-anonymity audit, freshness SLA report, time-decay attribution).
Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import pytest

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_k_anonymity_matches_python(spark, sf_dir, qs):
    rows = qs["k_anonymity_report"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "ts", "user_id"
    ).collect()
    cells: dict[tuple, set] = defaultdict(set)
    counts: dict[tuple, int] = defaultdict(int)
    for e in ev:
        key = (e.event_type, e.ts.date())
        cells[key].add(e.user_id)
        counts[key] += 1
    for r in rows:
        mine = {k: v for k, v in cells.items() if k[0] == r.event_type}
        assert r.n_cells == len(mine)
        risky = {k for k, v in mine.items() if len(v) < 5}
        assert r.n_risky_cells == len(risky)
        assert r.min_cell_users == min(len(v) for v in mine.values())
        n_events = sum(counts[k] for k in mine)
        risky_events = sum(counts[k] for k in risky)
        assert r.n_events == n_events and r.risky_events == risky_events
        assert r.risky_ppm == risky_events * 1_000_000 // n_events


def test_freshness_report_invariants(spark, sf_dir, qs):
    rows = qs["freshness_report"](spark, sf_dir).collect()
    assert {r.table_name for r in rows} == {"orders", "lineitem", "events"}
    assert min(r.staleness_days for r in rows) == 0
    for r in rows:
        assert r.staleness_days >= 0
        assert r.n_rows == read_table(spark, sf_dir, r.table_name).count()
        assert isinstance(r.high_water, dt.date)
    # lineitem ships after orders are placed -> lineitem is at least as
    # fresh as orders in the TPC-H generator
    by = {r.table_name: r for r in rows}
    assert by["lineitem"].high_water >= by["orders"].high_water


def test_time_decay_conserves_purchase_value(spark, sf_dir, qs):
    rows = qs["attribution_time_decay"](spark, sf_dir).collect()
    assert rows
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).collect()
    clicks_by_user = defaultdict(list)
    for e in ev:
        if e.event_type == "click":
            clicks_by_user[e.user_id].append(e.ts)
    week = dt.timedelta(days=7)
    attributable = 0.0
    n_attributable = 0
    for e in ev:
        if e.event_type != "purchase":
            continue
        if any(e.ts - week < c <= e.ts for c in clicks_by_user[e.user_id]):
            attributable += e.value
            n_attributable += 1
    # per-purchase shares sum to 1, so total attributed value equals the
    # value of purchases that have >= 1 click in the window
    total = sum(r.attributed_value for r in rows)
    assert abs(total - attributable) < 1e-3
    assert sum(r.n_purchases for r in rows) >= n_attributable  # purchase may span days
    assert all(r.n_touches >= r.n_purchases * 0 for r in rows)
    assert all(r.attributed_value >= 0 for r in rows)


def test_incremental_dedup_admission_contract(spark, sf_dir, qs):
    rows = qs["dedup_incremental_batch"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    n_odd = docs.filter("doc_id % 2 = 1").count()
    assert len(rows) == n_odd
    for r in rows:
        assert r.batch_id % 2 == 1  # only batch (odd) docs are admitted/rejected
        assert r.admitted == (r.n_index_dups == 0)
        if r.n_index_dups:
            assert r.first_dup_index_id is not None
            assert r.first_dup_index_id % 2 == 0  # dups point INTO the index
            assert r.max_jaccard >= 0.8
        else:
            assert r.first_dup_index_id is None and r.max_jaccard == 0.0
    # the batch-vs-index pair set is a subset of the full-corpus near-dup
    # pair set (same bands, same threshold)
    full = {
        (min(p.id_a, p.id_b), max(p.id_a, p.id_b))
        for p in qs["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    for r in rows:
        if r.n_index_dups:
            a, b = sorted((r.batch_id, r.first_dup_index_id))
            assert (a, b) in full


def test_label_knn_agreement_shape(spark, sf_dir, qs):
    rows = qs["label_knn_agreement"](spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings")
    assert sum(r.n_vecs for r in rows) == emb.count()
    assert {r.label for r in rows} == {
        x.label for x in emb.select("label").distinct().collect()
    }
    for r in rows:
        assert 0 <= r.n_agree <= r.n_evaluated <= r.n_vecs
        if r.n_evaluated:
            assert r.agree_ppm == r.n_agree * 1_000_000 // r.n_evaluated
        else:
            assert r.agree_ppm is None


def test_window_funnel_levels_partition_users(spark, sf_dir, qs):
    rows = qs["window_funnel_levels"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    n_users = len({e.user_id for e in ev})
    assert sum(r.n_users for r in rows) == n_users  # levels partition the base
    assert all(0 <= r.level <= 3 for r in rows)
    # python recompute of the windowFunnel semantics (24h anchored at view)
    per_user = defaultdict(lambda: defaultdict(list))
    for e in ev:
        per_user[e.user_id][e.event_type].append(e.ts)
    day = dt.timedelta(hours=24)
    levels = defaultdict(int)
    for u, by_type in per_user.items():
        lvl = 0
        views = sorted(by_type.get("view", []))
        if views:
            lvl = 1
            for t1 in views:
                clicks = [t for t in by_type.get("click", []) if t1 < t <= t1 + day]
                if clicks:
                    lvl = max(lvl, 2)
                    for t2 in clicks:
                        if any(
                            t2 < t3 <= t1 + day for t3 in by_type.get("purchase", [])
                        ):
                            lvl = 3
                            break
                if lvl == 3:
                    break
        levels[lvl] += 1
    assert {r.level: r.n_users for r in rows} == {
        k: v for k, v in levels.items() if v
    }


def test_retention_flags_ch_semantics(spark, sf_dir, qs):
    r = qs["retention_flags"](spark, sf_dir).collect()[0]
    assert r.cohort > 0
    assert r.cohort >= r.kept_w1 >= 0 and r.cohort >= r.kept_w2 >= 0
    assert r.w1_ppm == r.kept_w1 * 1_000_000 // r.cohort
    # recompute: kept counts only users active in the ANCHOR week
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    d0 = min(e.ts.date() for e in ev)
    weeks = defaultdict(set)
    for e in ev:
        weeks[(e.ts.date() - d0).days // 7].add(e.user_id)
    assert r.cohort == len(weeks[0])
    assert r.kept_w1 == len(weeks[0] & weeks.get(1, set()))
    assert r.kept_w3 == len(weeks[0] & weeks.get(3, set()))


def test_adaptive_histogram_bins(spark, sf_dir, qs):
    rows = sorted(qs["adaptive_histogram"](spark, sf_dir).collect(), key=lambda r: r.bin)
    o = read_table(spark, sf_dir, "orders")
    n = o.count()
    assert [r.bin for r in rows] == list(range(1, 9))
    assert sum(r.n for r in rows) == n
    # equal frequency: ntile bins differ by at most 1
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # adaptive boundaries are monotone and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert a.hi_cents <= b.lo_cents
        assert a.lo_cents <= a.hi_cents


def test_canonical_projection_beats_min_id_policy(spark, sf_dir, qs):
    rows = qs["dedup_canonical_projection"](spark, sf_dir).collect()
    assert rows
    comp = qs["dedup_components"](spark, sf_dir).collect()
    by_comp = defaultdict(list)
    for c in comp:
        by_comp[c.component].append(c.id)
    chars = {
        d.doc_id: d.n_chars
        for d in read_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    assert {r.component for r in rows} == set(by_comp)
    for r in rows:
        members = by_comp[r.component]
        assert r.n_members == len(members)
        best = max(chars[m] for m in members)
        assert chars[r.canonical_id] == best == r.canonical_chars
        # deterministic tie-break: smallest id among the longest members
        assert r.canonical_id == min(m for m in members if chars[m] == best)
        assert r.chars_saved == sum(chars[m] for m in members) - best
        assert r.chars_saved >= 0


def test_croston_matches_python_recurrence(spark, sf_dir, qs):
    rows = sorted(qs["croston_intermittent"](spark, sf_dir).collect(), key=lambda r: r.date)
    assert rows
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").collect()
    from collections import Counter

    demand = Counter()
    all_days = set()
    for r in o:
        d = r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate
        all_days.add(d)
        if r.o_orderkey % 101 == 0:
            demand[d] += 1
    d0, d1 = min(all_days), max(all_days)
    days = [d0 + dt.timedelta(days=i) for i in range((d1 - d0).days + 1)]
    z = p = None
    q = 0
    expect = []
    for d in days:
        y = float(demand.get(d, 0))
        q += 1
        if y > 0:
            if z is None:
                z, p = y, float(q)
            else:
                z = z + 0.2 * (y - z)
                p = p + 0.2 * (q - p)
            q = 0
        if z is not None:
            expect.append((d, y, z, p, z / p))
    assert len(rows) == len(expect)
    for r, (d, y, z, p, f) in zip(rows, expect):
        assert r.date == d and r.y == y
        assert r.z == z and r.p == p and r.forecast == f  # bit-exact IEEE


def test_naive_scorecard_recompute(spark, sf_dir, qs):
    rows = {r.metric: r for r in qs["naive_baseline_scorecard"](spark, sf_dir).collect()}
    assert set(rows) == {"order_count", "total_revenue"}
    daily = sorted(
        qs["daily_sales_series"](spark, sf_dir).collect(), key=lambda r: r.date
    )
    cnts = [r.order_count for r in daily]
    errs = [abs(a - b) for a, b in zip(cnts[7:], cnts[:-7])]
    r = rows["order_count"]
    assert r.n_days == len(errs)
    assert abs(r.mae - sum(errs) / len(errs)) < 1e-6
    import math

    assert abs(r.rmse - math.sqrt(sum(e * e for e in errs) / len(errs))) < 1e-6
    for r in rows.values():
        assert 0 <= r.smape <= 2.0
        assert r.rmse >= r.mae >= 0


def test_multivar_ols_matches_numpy_lstsq(spark, sf_dir, qs):
    r = qs["multivar_ols_daily"](spark, sf_dir).collect()[0]
    import numpy as np

    daily = sorted(
        qs["daily_sales_series"](spark, sf_dir).collect(), key=lambda x: x.date
    )
    d0 = daily[0].date
    t = np.array([(x.date - d0).days for x in daily], dtype=np.float64)
    w = np.array(
        [1.0 if x.date.weekday() >= 5 else 0.0 for x in daily], dtype=np.float64
    )
    y = np.array([x.total_revenue for x in daily], dtype=np.float64)
    X = np.column_stack([np.ones_like(t), t, w])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(r.intercept - beta[0]) < max(1e-3, abs(beta[0]) * 1e-5)
    assert abs(r.slope_per_day - beta[1]) < max(1e-3, abs(beta[1]) * 1e-3)
    assert abs(r.weekend_effect - beta[2]) < max(1e-3, abs(beta[2]) * 1e-3)
    resid = y - X @ beta
    sst = ((y - y.mean()) ** 2).sum()
    r2 = 1.0 - (resid**2).sum() / sst
    assert abs(r.r2 - r2) < 1e-4
    assert 0.0 <= r.r2 <= 1.0


def test_weighted_sample_es_favors_heavy_docs(spark, sf_dir, qs):
    rows = qs["weighted_sample_es"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert sorted(r.rank for r in rows) == list(range(1, 21))
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    mean_chars = sum(d.n_chars for d in docs) / len(docs)
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    # w = n_chars -> inclusion probability grows with length, so the
    # sample must be longer than the corpus average
    assert sample_mean > mean_chars
    # python recompute of the deterministic keys -> exact same top-20
    import hashlib

    def key(doc_id, n_chars):
        h = hashlib.md5(f"es|{doc_id}".encode()).hexdigest()[:15]
        u = (int(h, 16) % 1_000_000 + 0.5) / 1_000_000.0
        return round(u ** (1.0 / n_chars), 12)

    expect = sorted(
        ((key(d.doc_id, d.n_chars), d.doc_id) for d in docs),
        key=lambda kv: (-kv[0], kv[1]),
    )[:20]
    got = [(r.key, r.doc_id) for r in sorted(rows, key=lambda r: r.rank)]
    assert [g[1] for g in got] == [e[1] for e in expect]


def test_ch_array_functions_python_recompute(spark, sf_dir, qs):
    rows = {r.doc_id: r for r in qs["ch_array_functions"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        lens = [len(t) for t in __import__("re").split(r"[^a-z0-9]+", d.text.lower()) if t]
        r = rows[d.doc_id]
        assert r.n_tokens == len(lens)
        assert r.total_chars == sum(lens)
        assert r.n_distinct_lens == len(set(lens))
        runs = 1 + sum(1 for a, b in zip(lens, lens[1:]) if a != b)
        assert r.n_runs == runs  # arrayCompact length
        assert r.sum_abs_diff == sum(abs(b - a) for a, b in zip(lens, lens[1:]))
        assert r.max_len == max(lens) and r.min_len == min(lens)


def test_sample_by_user_is_all_or_nothing(spark, sf_dir, qs):
    rows = qs["sample_by_user_cohort"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    import hashlib

    def bucket(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 8

    sampled_users = {e.user_id for e in ev if bucket(e.user_id) == 1}
    for r in rows:
        evs = [e for e in ev if e.event_type == r.event_type]
        assert r.n_events == len(evs)
        in_sample = [e for e in evs if e.user_id in sampled_users]
        # all-or-nothing: the sampled event count is EXACTLY the events
        # of sampled users — no partial users
        assert r.sampled_events == len(in_sample)
        assert r.sampled_users == len({e.user_id for e in in_sample})
        assert r.event_rate_ppm == r.sampled_events * 1_000_000 // r.n_events


def test_locf_impute_repairs_all_masked_days(spark, sf_dir, qs):
    rows = sorted(qs["locf_impute_daily"](spark, sf_dir).collect(), key=lambda r: r.date)
    daily = {r.date: r.total_revenue for r in
             qs["daily_sales_series"](spark, sf_dir).collect()}
    assert len(rows) == len(daily)
    prev_val = None
    for r in rows:
        assert r.rev_imputed is not None  # every day repaired
        if r.was_imputed:
            assert r.date.day % 7 == 3
            if prev_val is not None:
                assert r.rev_imputed == prev_val  # LOCF takes the prior day
        else:
            assert abs(r.rev_imputed - round(daily[r.date], 2)) < 1e-9
            prev_val = r.rev_imputed
        if not r.was_imputed:
            prev_val = r.rev_imputed


def test_ch_array_functions_oracle_parity_on_short_docs(spark, tmp_path):
    """ADVICE r2: the DuckDB twin must match the guarded Spark semantics
    for 0- and 1-token docs (empty-list list_sum is NULL in DuckDB;
    COALESCE keeps n_runs/sum_abs_diff/total_chars at the Spark values)."""
    import duckdb
    import pandas as pd
    from clickhouse_forecasting_spark import queries as Q

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["", "...!!!", "hello", "one two two five", "a-b"],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [0, 6, 5, 16, 3],
        }
    )
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet", index=False)
    got = {
        r.doc_id: r for r in Q.q_ch_array_functions(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    oracle = con.execute(Q._CH_ARRAY_SQL).fetchall()
    cols = [d[0] for d in con.description]
    assert len(oracle) == len(got) == 5
    for orow in oracle:
        o = dict(zip(cols, orow))
        g = got[o["doc_id"]]
        for c in cols:
            assert getattr(g, c) == o[c], (o["doc_id"], c, getattr(g, c), o[c])
    # the guarded semantics themselves: 0-token docs report 1 run, 0 sums
    assert got[1].n_tokens == 0 and got[1].n_runs == 1
    assert got[1].total_chars == 0 and got[1].sum_abs_diff == 0
    assert got[3].n_tokens == 1 and got[3].n_runs == 1 and got[3].sum_abs_diff == 0
