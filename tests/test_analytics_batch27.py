"""Semantic invariants for the batch-27 queries (PII redaction,
ClickHouse -If combinators, sumMap rollup). Cross-engine value equality
is covered by the DuckDB oracle gate; these tests recompute the
semantics independently in Python.
"""

from __future__ import annotations

import json
import re
from collections import defaultdict

import pytest

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


P_EMAIL = re.compile(r"[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+")
P_PHONE = re.compile(r"555-[0-9]{3}-[0-9]{4}")
P_SSN = re.compile(r"[0-9]{3}-[0-9]{2}-[0-9]{4}")


def test_pii_redaction_matches_python(spark, sf_dir, qs):
    rows = {r.source: r for r in qs["pii_redaction_report"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # docs,pii,e,p,s,cut
    for d in docs:
        t = d.text
        if d.doc_id % 7 == 3:
            t += f" contact user{d.doc_id}@mail-example.org"
        if d.doc_id % 11 == 5:
            t += f" call 555-{d.doc_id % 1000:03d}-{d.doc_id % 10000:04d}"
        if d.doc_id % 13 == 8:
            t += f" id 078-05-{d.doc_id % 10000:04d}"
        e, p, s = len(P_EMAIL.findall(t)), len(P_PHONE.findall(t)), len(P_SSN.findall(t))
        red = P_SSN.sub("[SSN]", P_PHONE.sub("[PHONE]", P_EMAIL.sub("[EMAIL]", t)))
        a = agg[d.source]
        a[0] += 1
        a[1] += 1 if e + p + s else 0
        a[2] += e
        a[3] += p
        a[4] += s
        a[5] += len(t) - len(red)
        # the redacted text must be PII-free in the reference impl too
        assert not (P_EMAIL.search(red) or P_PHONE.search(red) or P_SSN.search(red))
    assert set(rows) == set(agg)
    for src, a in agg.items():
        r = rows[src]
        assert (r.n_docs, r.n_pii_docs, r.n_emails, r.n_phones, r.n_ssns,
                r.chars_redacted) == tuple(a)
        assert r.residual_pii == 0  # redaction missed nothing


def test_pii_corpus_actually_contains_every_class(spark, sf_dir, qs):
    tot = qs["pii_redaction_report"](spark, sf_dir).groupBy().sum(
        "n_emails", "n_phones", "n_ssns"
    ).collect()[0]
    assert all(v > 0 for v in tot), "injection produced an empty PII class"


def test_agg_if_matches_python(spark, sf_dir, qs):
    rows = {r.yr: r for r in qs["agg_if_combinators"](spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders").collect()
    by_yr = defaultdict(list)
    for r in o:
        by_yr[r.o_orderdate.year].append(r)
    assert set(rows) == set(by_yr)
    for yr, rs in by_yr.items():
        got = rows[yr]
        urgent = [r for r in rs if r.o_orderpriority.startswith("1-")]
        opened = [r for r in rs if r.o_orderstatus == "O"]
        assert got.n_orders == len(rs)
        assert got.count_if_final == sum(r.o_orderstatus == "F" for r in rs)
        assert got.sum_if_urgent_cents == sum(
            round(r.o_totalprice * 100) for r in urgent
        )
        assert got.uniq_if_open_buyers == len({r.o_custkey for r in opened})
        assert got.min_if_urgent_date == min(r.o_orderdate for r in urgent).date()
        assert got.max_if_urgent_date == max(r.o_orderdate for r in urgent).date()
        exact = sum(round(r.o_totalprice * 100) for r in opened)
        assert abs(got.avg_if_open_price - round(exact / (len(opened) * 100), 6)) < 1e-9


def test_summap_matches_python(spark, sf_dir, qs):
    rows = {r.event_type: r for r in qs["summap_props_rollup"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value", "props"
    ).collect()
    acc: dict[str, dict[int, list]] = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for e in ev:
        b = json.loads(e.props)["k"] % 10
        acc[e.event_type][b][0] += round(e.value * 100)
        acc[e.event_type][b][1] += 1
    assert set(rows) == set(acc)
    for et, buckets in acc.items():
        keys = sorted(buckets)
        r = rows[et]
        assert r.keys_csv == ",".join(str(k) for k in keys)
        assert r.sums_csv == ",".join(str(buckets[k][0]) for k in keys)
        assert r.counts_csv == ",".join(str(buckets[k][1]) for k in keys)


def test_welch_ttest_matches_scipy_formula(spark, sf_dir, qs):
    rows = qs["welch_ttest_segments"](spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").collect()
    seg_of = {r.c_custkey: r.c_mktsegment for r in c}
    vals = defaultdict(list)
    for r in o:
        vals[seg_of[r.o_custkey]].append(round(r.o_totalprice * 100) / 100)
    assert len(rows) == len(vals) * (len(vals) - 1) // 2
    import statistics

    for r in rows:
        assert r.seg_a < r.seg_b
        xa, xb = vals[r.seg_a], vals[r.seg_b]
        assert (r.n_a, r.n_b) == (len(xa), len(xb))
        ma, mb = statistics.fmean(xa), statistics.fmean(xb)
        va, vb = statistics.variance(xa), statistics.variance(xb)
        t = (ma - mb) / (va / len(xa) + vb / len(xb)) ** 0.5
        df = (va / len(xa) + vb / len(xb)) ** 2 / (
            (va / len(xa)) ** 2 / (len(xa) - 1) + (vb / len(xb)) ** 2 / (len(xb) - 1)
        )
        assert abs(r.t_stat - t) < 1e-4
        assert abs(r.welch_df - df) < 0.01


def test_m4_downsample_covers_series(spark, sf_dir, qs):
    rows = sorted(qs["m4_downsample_daily"](spark, sf_dir).collect(),
                  key=lambda r: r.bucket)
    daily = sorted(
        ((r.date, round(r.total_revenue * 100))
         for r in qs["daily_sales_series"](spark, sf_dir).collect())
    )
    assert [r.bucket for r in rows] == list(range(25))
    assert sum(r.n_days for r in rows) == len(daily)
    n = len(daily)
    for r in rows:
        members = [daily[i] for i in range(n) if i * 25 // n == r.bucket]
        assert r.n_days == len(members)
        assert (r.d_first, r.v_first) == members[0]
        assert (r.d_last, r.v_last) == members[-1]
        assert r.v_min == min(v for _, v in members)
        assert r.v_max == max(v for _, v in members)


def test_target_encoding_excludes_self(spark, sf_dir, qs):
    rows = qs["target_encode_nations"](spark, sf_dir).collect()
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    ).collect()
    by_nat = defaultdict(list)
    bal = {}
    for r in c:
        cents = round(r.c_acctbal * 100)
        by_nat[r.c_nationkey].append(cents)
        bal[r.c_custkey] = cents
    assert len(rows) == 50
    gaps = [r.abs_gap_cents for r in rows]
    assert gaps == sorted(gaps, reverse=True)
    for r in rows:
        sx, n = sum(by_nat[r.c_nationkey]), len(by_nat[r.c_nationkey])
        x = bal[r.c_custkey]
        assert abs(r.loo_encoding - round((sx - x) / (n - 1) / 100.0, 6)) < 1e-9


def test_vocab_coverage_matches_python(spark, sf_dir, qs):
    rows = {r.source: r for r in qs["vocab_coverage_report"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    from collections import Counter

    tok_re = re.compile(r"[^a-z0-9]+")
    counts = Counter()
    per_src = defaultdict(list)
    for d in docs:
        toks = [t for t in tok_re.split(d.text.lower()) if t]
        counts.update(toks)
        per_src[d.source].extend(toks)
    vocab = {t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:30]}
    assert set(rows) == set(per_src)
    for src, toks in per_src.items():
        r = rows[src]
        oov = sum(t not in vocab for t in toks)
        assert (r.tokens_total, r.tokens_oov) == (len(toks), oov)
        assert r.oov_ppm == oov * 1_000_000 // len(toks)


def test_cramers_v_matches_python(spark, sf_dir, qs):
    r = qs["cramers_v_association"](spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority").collect()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").collect()
    import math

    seg_of = {x.c_custkey: x.c_mktsegment for x in c}
    cells = defaultdict(int)
    for x in o:
        cells[(seg_of[x.o_custkey], x.o_orderpriority)] += 1
    n = sum(cells.values())
    ri = defaultdict(int)
    cj = defaultdict(int)
    for (s, p), v in cells.items():
        ri[s] += v
        cj[p] += v
    chi2 = sum(
        (v - ri[s] * cj[p] / n) ** 2 / (ri[s] * cj[p] / n)
        for (s, p), v in cells.items()
    )
    v_stat = math.sqrt(chi2 / (n * (min(len(ri), len(cj)) - 1)))
    hx = -sum(v / n * math.log(v / n) for v in ri.values())
    hy = -sum(v / n * math.log(v / n) for v in cj.values())
    hxy = -sum(v / n * math.log(v / n) for v in cells.values())
    assert r.n_orders == n
    assert abs(r.chi2 - chi2) < 1e-3
    assert abs(r.cramers_v - v_stat) < 1e-6
    assert abs(r.theils_u_seg - (hx - (hxy - hy)) / hx) < 1e-6
    assert abs(r.theils_u_prio - (hy - (hxy - hx)) / hy) < 1e-6
    assert 0.0 <= r.cramers_v <= 1.0
    assert 0.0 <= r.theils_u_seg <= 1.0


def test_bitmap_set_ops_match_python(spark, sf_dir, qs):
    rows = qs["bitmap_set_ops"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    users = defaultdict(set)
    for e in ev:
        users[e.event_type].add(e.user_id)
    types = sorted(users)
    expect_pairs = [(a, b) for a in types for b in types if a < b]
    assert sorted((r.type_a, r.type_b) for r in rows) == expect_pairs
    for r in rows:
        A, B = users[r.type_a], users[r.type_b]
        assert (r.n_a, r.n_b) == (len(A), len(B))
        assert r.n_and == len(A & B)
        assert r.n_or == len(A | B)
        assert r.n_xor == len(A ^ B)
        assert r.n_and + r.n_xor == r.n_or  # set identity
        assert r.jaccard_ppm == len(A & B) * 1_000_000 // len(A | B)


def test_curriculum_phases_partition_corpus(spark, sf_dir, qs):
    rows = sorted(qs["curriculum_phases"](spark, sf_dir).collect(), key=lambda r: r.phase)
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert [r.phase for r in rows] == [1, 2, 3, 4, 5]
    assert sum(r.n_docs for r in rows) == n_docs
    # ntile balance: sizes differ by at most 1
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # quality is non-increasing across phases and cumsum is consistent
    for prev, cur in zip(rows, rows[1:]):
        assert prev.q_min >= cur.q_max - 1e-9
        assert cur.tokens_cum == prev.tokens_cum + cur.tokens


def test_geo_distances_match_haversine_closely(spark, sf_dir, qs):
    import math

    rows = qs["geo_nation_distances"](spark, sf_dir).collect()
    assert len(rows) == 20
    dists = [r.dist_km for r in rows]
    assert dists == sorted(dists)

    def coords(k):
        return -60.0 + k * 5.0, -170.0 + k * 13.0

    name_to_key = {
        r.n_name: r.n_nationkey
        for r in read_table(spark, sf_dir, "nation").collect()
    }
    for r in rows:
        la, lo = coords(name_to_key[r.nation_a])
        lb, lob = coords(name_to_key[r.nation_b])
        # reference: true-cos equirectangular; the polynomial cos agrees
        # to ~1e-8 rad, so km distances match well under a metre
        mlat = math.radians((la + lb) / 2)
        x = math.radians(lob - lo) * math.cos(mlat)
        y = math.radians(lb - la)
        assert abs(r.dist_km - 6371.0 * math.hypot(x, y)) < 1e-3


def test_woe_iv_matches_python(spark, sf_dir, qs):
    import math

    rows = {r.seg: r for r in qs["woe_information_value"](spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").collect()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag").collect()
    bad_orders = {x.l_orderkey for x in li if x.l_returnflag == "R"}
    seg_of = {x.c_custkey: x.c_mktsegment for x in c}
    good = defaultdict(int)
    bad = defaultdict(int)
    for x in o:
        (bad if x.o_orderkey in bad_orders else good)[seg_of[x.o_custkey]] += 1
    tg, tb = sum(good.values()), sum(bad.values())
    iv_total = 0.0
    for seg in rows:
        pg, pb = good[seg] / tg, bad[seg] / tb
        iv_total += (pg - pb) * math.log(pg / pb)
    for seg, r in rows.items():
        pg, pb = good[seg] / tg, bad[seg] / tb
        assert (r.n_good, r.n_bad) == (good[seg], bad[seg])
        assert abs(r.woe - math.log(pg / pb)) < 1e-6
        assert abs(r.iv_part - (pg - pb) * math.log(pg / pb)) < 1e-6
        assert abs(r.iv_total - iv_total) < 1e-6


def test_sequence_count_matches_greedy_scan(spark, sf_dir, qs):
    rows = {r.n_chains: r.n_users for r in
            qs["sequence_count_chains"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per_user = defaultdict(list)
    for e in ev:
        if e.event_type in ("view", "purchase"):
            per_user[e.user_id].append((e.ts, e.event_id, e.event_type))
    dist = defaultdict(int)
    for _, evs in per_user.items():
        armed = matched = 0
        for _, _, t in sorted(evs):
            if t == "view":
                armed += 1
            elif armed > matched:
                matched += 1
        if any(t == "purchase" for _, _, t in evs):
            dist[matched] += 1
    # users with purchases only (no view row at all) still appear via the
    # is_p filter; users with zero purchase rows are out of scope
    assert rows == dict(dist)


def test_roc_auc_matches_sklearn_formula(spark, sf_dir, qs):
    r = qs["roc_auc_embeddings"](spark, sf_dir).collect()[0]
    emb = read_table(spark, sf_dir, "embeddings").collect()
    pairs = []
    for e in emb:
        s = round(float(e.embedding[0]), 6)
        pairs.append((s, 1 if e.label >= 5 else 0))
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    # O(n_pos*n_neg) direct AUC with half-credit ties
    wins = sum((a > b) + 0.5 * (a == b) for a in pos for b in neg)
    assert abs(r.auc - wins / (len(pos) * len(neg))) < 1e-6
    assert 0.0 <= r.auc <= 1.0


def test_ab_cuped_matches_python(spark, sf_dir, qs):
    import datetime as dt
    import statistics

    rows = {r.arm: r for r in qs["ab_cuped_scorecard"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value").collect()
    t0 = dt.datetime(2024, 1, 16)
    acc = defaultdict(lambda: [0, 0])  # user -> [x_cents, y_cents]
    for e in ev:
        acc[e.user_id][0 if e.ts < t0 else 1] += round(e.value * 100)
    xs = [v[0] for v in acc.values()]
    ys = [v[1] for v in acc.values()]
    mx = statistics.fmean(xs)
    my = statistics.fmean(ys)
    theta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    arms = defaultdict(lambda: ([], []))
    for uid, (x, y) in acc.items():
        raw, adj = arms[uid % 2]
        raw.append(y)
        adj.append(y - theta * (x - mx))
    for arm, r in rows.items():
        raw, adj = arms[arm]
        assert r.n_users == len(raw)
        assert abs(r.mean_value - round(statistics.fmean(raw) / 100, 6)) < 1e-6
        assert abs(r.mean_cuped - round(statistics.fmean(adj) / 100, 6)) < 1e-6
        assert abs(r.theta - theta) < 1e-5
        # CUPED can only help (or tie): pooled variance must not grow
        assert r.var_reduction_ppm >= 0


def test_calibration_bins_cover_and_sum(spark, sf_dir, qs):
    rows = sorted(qs["calibration_bins"](spark, sf_dir).collect(), key=lambda r: r.bin)
    emb = read_table(spark, sf_dir, "embeddings").collect()
    n_total = len(emb)
    assert sum(r.n for r in rows) == n_total
    assert all(0 <= r.bin <= 9 for r in rows)
    scores = [round(float(e.embedding[0]), 6) for e in emb]
    lo, hi = min(scores), max(scores)
    pos = {round(float(e.embedding[0]), 6): 0 for e in emb}
    by_bin = defaultdict(lambda: [0, 0, 0.0])
    for e in emb:
        s = round(float(e.embedding[0]), 6)
        p = (s - lo) / (hi - lo)
        b = min(int(p * 10), 9)
        by_bin[b][0] += 1
        by_bin[b][1] += 1 if e.label >= 5 else 0
        by_bin[b][2] += p
    for r in rows:
        n, npos, psum = by_bin[r.bin]
        assert (r.n, r.n_pos) == (n, npos)
        assert r.obs_ppm == npos * 1_000_000 // n
        assert abs(r.mean_pred - round(psum / n, 6)) < 1e-5


def test_fertility_is_at_least_one_token_per_word(spark, sf_dir, qs):
    rows = qs["tokenizer_fertility_by_lang"](spark, sf_dir).collect()
    langs = {r.lang for r in rows}
    assert langs == {"en", "de", "fr", "es", "zh"}
    for r in rows:
        # BPE-ish splitter can only split words further, never merge
        assert r.bpe_tokens >= r.ws_tokens
        assert r.fertility_ppm >= 1_000_000


def test_ab_power_matches_python(spark, sf_dir, qs):
    import math

    r = qs["ab_power_analysis"](spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    users = {e.user_id for e in ev}
    conv = {e.user_id for e in ev if e.event_type == "purchase"}
    p1 = len(conv) / len(users)
    p2 = p1 * 0.95
    pbar = (p1 + p2) / 2
    za, zb = 1.9599639845400545, 0.8416212335729143
    nreq = math.ceil(
        ((za * math.sqrt(2 * pbar * (1 - pbar))
          + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) / (p2 - p1)) ** 2
    )
    assert r.n_users == len(users)
    assert abs(r.baseline_rate - round(p1, 6)) < 1e-9
    assert r.n_required_per_arm == nreq
    assert r.is_powered == (nreq * 2 <= len(users))


def test_encoding_advisor_matches_python(spark, sf_dir, qs):
    rows = {r.column_name: r for r in
            qs["encoding_advisor_lineitem"](spark, sf_dir).collect()}
    li = sorted(
        read_table(spark, sf_dir, "lineitem").collect(),
        key=lambda r: (r.l_orderkey, r.l_linenumber),
    )
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_discount",
            "l_suppkey", "l_shipdate"]
    assert set(rows) == set(cols)
    for c in cols:
        vals = [getattr(r, c) for r in li]
        runs = sum(1 for a, b in zip(vals, vals[1:]) if a != b) + 1
        r = rows[c]
        assert r.n_rows == len(vals)
        # first row has no lag → counted as a change (run start)
        assert r.n_runs == runs
        assert r.n_distinct == len(set(vals))
        assert r.recommendation in ("rle", "dict", "plain")
        if r.run_ppm < 500_000:
            assert r.recommendation == "rle"


def test_bootstrap_ci_brackets_observed_mean(spark, sf_dir, qs):
    import hashlib

    r = qs["bootstrap_ci_daily_mean"](spark, sf_dir).collect()[0]
    daily = sorted(
        (rr.date, round(rr.total_revenue * 100))
        for rr in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    cents = [c for _, c in daily]
    n = len(cents)
    assert (r.n_resamples, r.n_days) == (200, n)
    assert abs(r.mean_daily_revenue - round(sum(cents) / n / 100, 6)) < 1e-6
    means = []
    for b in range(1, 201):
        tot = 0
        for k in range(1, n + 1):
            j = int(hashlib.md5(str(b * 100000 + k).encode()).hexdigest()[:15], 16) % n
            tot += cents[j]  # j in 0..n-1 here == engine's (j+1)-th row
        means.append(tot / n / 100)
    means.sort()
    assert abs(r.ci_lo - round(means[4], 6)) < 1e-6
    assert abs(r.ci_hi - round(means[194], 6)) < 1e-6
    assert r.ci_lo <= r.mean_daily_revenue <= r.ci_hi


def test_limit_by_skips_top_and_keeps_two(spark, sf_dir, qs):
    rows = qs["limit_by_per_group"](spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    ).collect()
    by_p = defaultdict(list)
    for r in o:
        by_p[r.o_orderpriority].append((-round(r.o_totalprice * 100), r.o_orderkey))
    got = defaultdict(list)
    for r in rows:
        got[r.priority].append((r.rnk, r.o_orderkey, r.cents))
    assert set(got) == set(by_p)
    for p, lst in by_p.items():
        lst.sort()
        expect = [
            (i + 2, k, -negc) for i, (negc, k) in enumerate(lst[1:3])
        ]
        assert got[p] == expect


def test_with_totals_row_is_sum_of_groups(spark, sf_dir, qs):
    rows = {r.status: r for r in qs["group_by_with_totals"](spark, sf_dir).collect()}
    tot = rows.pop("__totals__")
    assert tot.n_orders == sum(r.n_orders for r in rows.values())
    assert tot.revenue_cents == sum(r.revenue_cents for r in rows.values())
    assert set(rows) == {"F", "O", "P"}


def test_ttl_rollup_is_lossless_and_compacts(spark, sf_dir, qs):
    import datetime as dt

    rows = qs["ttl_rollup_compaction"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select(
        "ts", "event_id", "event_type", "value"
    ).collect()
    t0 = dt.datetime(2024, 1, 20)
    assert sum(r.events_represented for r in rows) == len(ev)
    assert sum(r.value_cents for r in rows) == sum(round(e.value * 100) for e in ev)
    for r in rows:
        if r.granularity == "rollup":
            assert r.day < t0.date()
            types = {e.event_type for e in ev if e.ts.date() == r.day and e.ts < t0}
            assert r.stored_rows == len(types)  # one row per type
            assert r.compaction_ratio_ppm < 1_000_000 or r.events_represented == r.stored_rows
        else:
            assert r.day >= t0.date()
            assert r.stored_rows == r.events_represented  # raw rows kept 1:1
            assert r.compaction_ratio_ppm == 1_000_000


def test_theta_method_matches_independent_recurrence(spark, sf_dir, qs):
    rows = sorted(qs["theta_method_daily"](spark, sf_dir).collect(), key=lambda r: r.h)
    daily = sorted(
        (r.date, round(r.total_revenue * 100))
        for r in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    ys = [c for _, c in daily]
    n = len(ys)
    st, stt = n * (n + 1) // 2, n * (n + 1) * (2 * n + 1) // 6
    sy = sum(ys)
    sty = sum((t + 1) * y for t, y in enumerate(ys))
    a1 = float(n * sty - st * sy) / float(n * stt - st * st)
    a0 = (sy - a1 * st) / n
    s = None
    for t, y in enumerate(ys, start=1):
        x2 = 2.0 * y - (a0 + a1 * t)
        s = x2 if s is None else 0.5 * x2 + 0.5 * s
    assert [r.h for r in rows] == list(range(1, 15))
    for r in rows:
        assert r.forecast == (s + (r.h - 1 + 2.0) * (a1 / 2.0)) / 100.0  # bit-exact
        assert r.ses_level == s / 100.0
        assert r.slope_cents == a1
    # theta forecasts step by slope/2 per horizon
    step = rows[1].forecast - rows[0].forecast
    assert abs(step - a1 / 2.0 / 100.0) < 1e-9


def test_ql_dirichlet_matches_python(spark, sf_dir, qs):
    import math

    rows = qs["ql_dirichlet_search"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    terms = ["stream", "filter", "vector"]
    tok_re = re.compile(r"[^a-z0-9]+")
    per = {}
    ctot = 0
    ctf = [0, 0, 0]
    for d in docs:
        toks = [t for t in tok_re.split(d.text.lower()) if t]
        tfs = [toks.count(t) for t in terms]
        per[d.doc_id] = (len(toks), tfs)
        ctot += len(toks)
        for i in range(3):
            ctf[i] += tfs[i]
    scored = sorted(
        (
            (
                round(
                    sum(
                        math.log((tfs[i] + 100.0 * (ctf[i] / ctot)) / (dl + 100.0))
                        for i in range(3)
                    ),
                    6,
                ),
                doc_id,
            )
            for doc_id, (dl, tfs) in per.items()
        ),
        key=lambda p: (-p[0], p[1]),
    )[:20]
    assert [(r.ql_score, r.doc_id) for r in rows] == scored


def test_hurst_matches_python(spark, sf_dir, qs):
    import math

    rows = sorted(qs["hurst_exponent_daily"](spark, sf_dir).collect(), key=lambda r: r.s)
    daily = sorted(
        (r.date, round(r.total_revenue * 100))
        for r in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    ys = [c for _, c in daily]
    pts = []
    for s in (8, 16, 32, 64):
        rss = []
        for b in range(len(ys) // s):
            blk = ys[b * s:(b + 1) * s]
            mean = sum(blk) / s
            sd = math.sqrt(sum(v * v for v in blk) / s - mean * mean)
            cum, lo, hi = 0.0, float("inf"), float("-inf")
            for v in blk:
                cum += v - mean
                lo, hi = min(lo, cum), max(hi, cum)
            rss.append(round((hi - lo) / sd, 6))
        mean_rs = sum(rss) / len(rss)
        pts.append((math.log(s), math.log(mean_rs), len(rss), mean_rs, s))
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    hurst = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for r, (_, _, nb, mrs, s) in zip(rows, pts):
        assert r.s == s and r.n_blocks == nb
        assert abs(r.mean_rs - mrs) < 1e-4
        assert abs(r.hurst - hurst) < 1e-4
    assert 0.0 < rows[0].hurst < 1.0


def test_markov_entropy_matches_python(spark, sf_dir, qs):
    import math

    rows = {r.src: r for r in qs["markov_entropy_rate"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.ts, e.event_id, e.event_type))
    counts = defaultdict(int)
    for u, evs in per_user.items():
        seq = [t for _, _, t in sorted(evs)]
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    nsrc = defaultdict(int)
    for (a, _), n in counts.items():
        nsrc[a] += n
    ntot = sum(counts.values())
    h_rate = sum(
        -(nsrc[a] / ntot) * (n / nsrc[a]) * math.log(n / nsrc[a])
        for (a, _), n in counts.items()
    )
    assert set(rows) == set(nsrc)
    for a, r in rows.items():
        assert r.n_transitions == nsrc[a]
        row_h = sum(
            -(n / nsrc[a]) * math.log(n / nsrc[a])
            for (x, _), n in counts.items() if x == a
        )
        assert abs(r.row_entropy - row_h) < 1e-5
        assert abs(r.entropy_rate - h_rate) < 1e-5


def test_evt_gumbel_matches_python(spark, sf_dir, qs):
    import math

    rows = sorted(
        qs["evt_gumbel_daily_revenue"](spark, sf_dir).collect(), key=lambda r: r.t
    )
    daily = sorted(
        (r.date, round(r.total_revenue * 100))
        for r in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    monthly = defaultdict(int)
    for d, c in daily:
        monthly[(d.year, d.month)] = max(monthly[(d.year, d.month)], c)
    mx = list(monthly.values())
    n = len(mx)
    mean = sum(mx) / n
    sd = math.sqrt((sum(v * v for v in mx) - sum(mx) ** 2 / n) / (n - 1))
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    assert [r.t for r in rows] == [10, 50, 100]
    for r in rows:
        assert r.n_blocks == n
        assert abs(r.gumbel_mu - mu / 100) < 1e-4
        assert abs(r.gumbel_beta - beta / 100) < 1e-4
        rl = mu - beta * math.log(-math.log(1 - 1 / r.t))
        assert abs(r.return_level - rl / 100) < 1e-4
    # return levels grow with rarity
    assert rows[0].return_level < rows[1].return_level < rows[2].return_level


def test_template_skeleton_matches_python(spark, sf_dir, qs):
    rows = {r.source: r for r in
            qs["template_skeleton_dedup"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    ws_re = re.compile(r"\s+")
    num_re = re.compile(r"[0-9]+")
    per = defaultdict(lambda: defaultdict(int))
    for d in docs:
        sk = ws_re.sub(" ", num_re.sub("#", d.text.lower())).strip()
        per[d.source][sk] += 1
    assert set(rows) == set(per)
    for src, sks in per.items():
        r = rows[src]
        assert r.n_docs == sum(sks.values())
        assert r.n_skeletons == len(sks)
        assert r.docs_in_collisions == sum(n for n in sks.values() if n > 1)
        assert r.removable_docs == sum(n - 1 for n in sks.values())
        assert r.dup_ppm == r.removable_docs * 1_000_000 // r.n_docs


def test_padding_waste_bucketing_never_hurts(spark, sf_dir, qs):
    rows = qs["padding_waste_report"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents").select("text").collect()
    tok_re = re.compile(r"[^a-z0-9]+")
    lens = [min(len([t for t in tok_re.split(d.text.lower()) if t]), 512)
            for d in docs]
    assert sum(r.n_docs for r in rows) == len(lens)
    gmax = max(lens)
    for r in rows:
        members = [l for l in lens
                   if max(-(-l // 64) * 64, 64) == r.bucket_cap]
        assert r.n_docs == len(members)
        assert r.real_tokens == sum(members)
        assert r.bucket_max == max(members)
        assert r.bucket_waste == r.bucket_max * r.n_docs - r.real_tokens
        assert r.global_waste == gmax * r.n_docs - r.real_tokens
        assert r.bucket_waste <= r.global_waste  # bucketing never hurts
        assert 0 <= r.saved_ppm <= 1_000_000


def test_preference_pairs_disjoint_and_margin_positive(spark, sf_dir, qs):
    rows = qs["preference_pairs"](spark, sf_dir).collect()
    used = defaultdict(set)
    n_docs = read_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert r.margin > 0
        # a doc appears in at most one pair per source, one side only
        assert r.chosen_id not in used[r.source]
        assert r.rejected_id not in used[r.source]
        used[r.source].update((r.chosen_id, r.rejected_id))
    assert sum(len(v) for v in used.values()) <= n_docs
    assert len(rows) > 0


def test_burstiness_matches_python(spark, sf_dir, qs):
    import math

    rows = {r.band: r for r in qs["burstiness_index"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_id").collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.ts, e.event_id))
    by_band = defaultdict(list)
    for u, evs in per_user.items():
        ts = [t for t, _ in sorted(evs)]
        gaps = [
            round((b - a).total_seconds() * 1_000_000)
            for a, b in zip(ts, ts[1:])
        ]
        if len(gaps) < 2:
            continue
        n = len(gaps)
        mu = sum(gaps) / n
        sd = math.sqrt(sum(g * g for g in gaps) / n - mu * mu)
        band = "a_under_50" if n < 50 else ("b_50_to_99" if n < 100 else "c_100_plus")
        by_band[band].append(round((sd - mu) / (sd + mu), 6))
    assert set(rows) == set(by_band)
    for band, bs in by_band.items():
        r = rows[band]
        assert r.n_users == len(bs)
        assert abs(r.mean_burstiness - round(sum(bs) / len(bs), 6)) < 2e-6
        assert (r.min_b, r.max_b) == (min(bs), max(bs))
        assert -1.0 <= r.min_b and r.max_b < 1.0


def test_capture_recapture_matches_python(spark, sf_dir, qs):
    import math

    r = qs["capture_recapture_users"](spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    viewers = {e.user_id for e in ev if e.event_type == "view"}
    clickers = {e.user_id for e in ev if e.event_type == "click"}
    both = viewers & clickers
    n1, n2, m = len(viewers), len(clickers), len(both)
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert (r.n_viewers, r.n_clickers, r.n_both) == (n1, n2, m)
    assert abs(r.n_hat - nhat) < 1e-3
    var = (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) / ((m + 1) ** 2 * (m + 2))
    half = 1.959963984540054 * math.sqrt(var)
    assert abs(r.ci_lo - (nhat - half)) < 1e-3
    assert abs(r.ci_hi - (nhat + half)) < 1e-3
    # estimate can't be below what we directly observed in the two samples
    assert r.n_hat >= n1 + n2 - m - 1


def test_ljung_box_matches_python(spark, sf_dir, qs):
    import math

    r = qs["ljung_box_daily"](spark, sf_dir).collect()[0]
    daily = sorted(
        (rr.date, round(rr.total_revenue * 100))
        for rr in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    ys = [c for _, c in daily]
    n = len(ys)
    assert r.n_days == n and r.df == 14
    ssum = 0.0
    for k in range(1, 15):
        xs, zs = ys[:-k], ys[k:]
        m = len(xs)
        sx, sy = sum(xs), sum(zs)
        sxy = sum(a * b for a, b in zip(xs, zs))
        sxx, syy = sum(a * a for a in xs), sum(b * b for b in zs)
        rk = round(
            (m * sxy - sx * sy)
            / math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)),
            6,
        )
        ssum += round(rk * rk / (n - k), 12)
    q = n * (n + 2.0) * ssum
    assert abs(r.q_stat - q) < 1e-4
    assert r.reject_white_noise == (q > 23.684791304840576)


def test_replacing_final_matches_python(spark, sf_dir, qs):
    r = qs["replacing_final_cdc"](spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    ).collect()
    last = {}
    deletes = 0
    for e in ev:
        is_del = e.event_id % 10 == 0
        deletes += is_del
        cur = last.get(e.user_id)
        if cur is None or e.event_id > cur[0]:
            last[e.user_id] = (e.event_id, is_del, round(e.value * 100))
    survivors = {u: v for u, (ver, d, v) in last.items() if not d}
    assert r.n_keys == len(last)
    assert r.n_upserts == len(ev)
    assert r.n_tombstones == deletes
    assert r.n_survivors == len(survivors)
    assert r.survivor_cents == sum(survivors.values())


def test_collapsing_balance_matches_python(spark, sf_dir, qs):
    rows = {r.state: r for r in
            qs["collapsing_merge_balance"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    per = defaultdict(lambda: [0, 0])  # rows, net
    for e in ev:
        if e.event_type == "view":
            per[e.user_id][0] += 1
            per[e.user_id][1] += 1
        elif e.event_type == "click":
            per[e.user_id][0] += 1
            per[e.user_id][1] -= 1
    agg = defaultdict(lambda: [0, 0, 0])
    for _, (n, net) in per.items():
        state = ("views_surplus" if net > 0
                 else "clicks_surplus" if net < 0 else "balanced")
        a = agg[state]
        a[0] += 1
        a[1] += n
        a[2] += abs(net)
    assert set(rows) == set(agg)
    for state, (nu, rb, ra) in agg.items():
        r = rows[state]
        assert (r.n_users, r.rows_before, r.rows_after) == (nu, rb, ra)
        assert r.rows_collapsed == rb - ra
        # collapsed rows come in (+1,-1) pairs
        assert r.rows_collapsed % 2 == 0


def test_rolling_median_matches_python(spark, sf_dir, qs):
    rows = sorted(qs["rolling_median_7d"](spark, sf_dir).collect(), key=lambda r: r.d)
    daily = sorted(
        (rr.date, round(rr.total_revenue * 100))
        for rr in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    cents = [c for _, c in daily]
    assert len(rows) == len(cents)
    for i, r in enumerate(rows):
        frame = sorted(cents[max(0, i - 6):i + 1])
        n = len(frame)
        assert r.frame_days == n
        med = (frame[n // 2] if n % 2 == 1
               else (frame[n // 2 - 1] + frame[n // 2]) / 2)
        assert abs(r.median_7d - round(med / 100, 3)) < 1e-9


def test_rrf_fusion_matches_python(spark, sf_dir, qs):
    import math

    rows = qs["rrf_fusion_search"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    terms = ["stream", "filter", "vector"]
    tok_re = re.compile(r"[^a-z0-9]+")
    per = {}
    for d in docs:
        toks = [t for t in tok_re.split(d.text.lower()) if t]
        per[d.doc_id] = (len(toks), [toks.count(t) for t in terms])
    nd = len(per)
    ctot = sum(dl for dl, _ in per.values())
    ctf = [sum(tfs[i] for _, tfs in per.values()) for i in range(3)]
    df = [sum(tfs[i] > 0 for _, tfs in per.values()) for i in range(3)]
    avgdl = ctot / nd
    bm, ql = {}, {}
    for did, (dl, tfs) in per.items():
        bm[did] = sum(
            math.log((nd - df[i] + 0.5) / (df[i] + 0.5) + 1.0)
            * (tfs[i] * 2.2) / (tfs[i] + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
            for i in range(3)
        )
        ql[did] = sum(
            math.log((tfs[i] + 100.0 * (ctf[i] / ctot)) / (dl + 100.0))
            for i in range(3)
        )
    r_bm = {d: r + 1 for r, (s, d) in enumerate(
        sorted(((-s, d) for d, s in bm.items())))}
    r_ql = {d: r + 1 for r, (s, d) in enumerate(
        sorted(((-s, d) for d, s in ql.items())))}
    fused = sorted(
        ((-(1.0 / (60 + r_bm[d]) + 1.0 / (60 + r_ql[d])), d) for d in per),
    )[:20]
    assert [(r.doc_id, r.r_bm25, r.r_ql) for r in rows] == [
        (d, r_bm[d], r_ql[d]) for _, d in fused
    ]
    for r in rows:
        assert abs(r.rrf_score
                   - round(1.0 / (60 + r.r_bm25) + 1.0 / (60 + r.r_ql), 9)) < 1e-12


def test_lag_feature_matrix_matches_python(spark, sf_dir, qs):
    rows = sorted(qs["lag_feature_matrix"](spark, sf_dir).collect(), key=lambda r: r.d)
    daily = sorted(
        (rr.date, round(rr.total_revenue * 100))
        for rr in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    cents = [c for _, c in daily]
    dates = [d for d, _ in daily]
    assert len(rows) == len(daily) - 28
    for i, r in enumerate(rows, start=28):
        assert r.d == dates[i]
        assert r.y == round(cents[i] / 100, 2)
        assert r.lag_1 == round(cents[i - 1] / 100, 2)
        assert r.lag_7 == round(cents[i - 7] / 100, 2)
        assert r.lag_28 == round(cents[i - 28] / 100, 2)
        frame = cents[i - 6:i + 1]
        assert abs(r.mean_7d - round(sum(frame) / 7 / 100, 6)) < 1e-9
        assert r.isodow == dates[i].isoweekday()
        assert abs(r.target_wow - round((cents[i] - cents[i - 7]) / 100, 2)) < 1e-9


def test_bucketed_percentile_error_is_bounded(spark, sf_dir, qs):
    rows = {r.p: r for r in qs["bucketed_percentile_error"](spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").collect()
    o = {r.o_orderkey: r.o_orderdate for r in
         read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").collect()}
    delays = sorted((r.l_shipdate.date() - o[r.l_orderkey].date()).days for r in li)
    n = len(delays)
    span = delays[-1] - delays[0]
    for p, q in ((50, 0.5), (90, 0.9), (99, 0.99)):
        k = int(q * n) if (q * n) == int(q * n) else int(q * n) + 1
        assert rows[p].exact_days == delays[max(k, 1) - 1]
        # histogram estimate must land within one bucket width of exact
        assert rows[p].abs_err_days <= span / 64 + 1e-9


def test_dp_noise_matches_python(spark, sf_dir, qs):
    import hashlib
    import math

    rows = {r.n_name: r for r in qs["dp_noise_report"](spark, sf_dir).collect()}
    c = read_table(spark, sf_dir, "customer").select("c_nationkey").collect()
    n = {r.n_nationkey: r.n_name for r in
         read_table(spark, sf_dir, "nation").collect()}
    counts = defaultdict(int)
    for r in c:
        counts[r.c_nationkey] += 1
    assert set(rows) == {n[k] for k in counts}
    for k, cnt in counts.items():
        r = rows[n[k]]
        u = int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16) / 16 ** 13
        noise = -math.copysign(1, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
        assert r.true_count == cnt
        assert abs(r.noise - noise) < 1e-5
        assert r.released_count == max(round(cnt + noise), 0)
        assert r.abs_err == abs(r.released_count - cnt)
    # epsilon=1 Laplace noise is almost surely small vs count
    assert all(r.abs_err <= 15 for r in rows.values())


def test_quantile_normalization_equalizes_distributions(spark, sf_dir, qs):
    rows = qs["quantile_normalization_sources"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents").select("source", "doc_id", "text").collect()
    tok_re = re.compile(r"[^a-z0-9]+")
    per = [(d.source, d.doc_id, len([t for t in tok_re.split(d.text.lower()) if t]))
           for d in docs]
    pooled = sorted((l, did) for _, did, l in per)
    N = len(pooled)
    by_src = defaultdict(list)
    for s, did, l in per:
        by_src[s].append((l, did))
    for r in rows:
        members = sorted(by_src[r.source])
        ns = len(members)
        assert r.n_docs == ns
        mapped = [pooled[math_ceil(rs * N / ns) - 1][0]
                  for rs in range(1, ns + 1)]
        assert abs(r.mean_len_before - round(sum(l for l, _ in members) / ns, 6)) < 1e-9
        assert abs(r.mean_len_after - round(sum(mapped) / ns, 6)) < 1e-9
    # after normalization, shard means collapse toward the pooled mean:
    # the spread across sources shrinks
    before = [r.mean_len_before for r in rows]
    after = [r.mean_len_after for r in rows]
    assert max(after) - min(after) <= max(before) - min(before)


def math_ceil(x):
    import math

    return math.ceil(x)  # same IEEE double ceil as both engines


def test_changepoint_binseg_matches_python(spark, sf_dir, qs):
    import math

    r = qs["changepoint_binseg_daily"](spark, sf_dir).collect()[0]
    daily = sorted(
        (rr.date, round(rr.total_revenue * 100))
        for rr in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    cents = [c for _, c in daily]
    n = len(cents)
    best = None
    pk = 0
    tot = sum(cents)
    for k in range(1, n):
        pk += cents[k - 1]
        ml, mr = pk / k, (tot - pk) / (n - k)
        stat = math.sqrt(k * (n - k) / n) * abs(ml - mr)
        if best is None or stat > best[0] + 1e-9:
            best = (stat, k, daily[k - 1][0], ml, mr)
    stat, k, d, ml, mr = best
    assert (r.d, r.split_k) == (d, k)
    assert abs(r.stat - stat) < 1e-3
    assert abs(r.mean_before - ml / 100) < 1e-3
    assert abs(r.mean_after - mr / 100) < 1e-3


def test_seasonal_strength_bounds(spark, sf_dir, qs):
    r = qs["seasonal_strength_daily"](spark, sf_dir).collect()[0]
    n_days = qs["daily_sales_series"](spark, sf_dir).count()
    assert r.n_days == n_days
    assert 0.0 <= r.seasonal_strength <= 1.0
    assert 0.0 <= r.trend_strength <= 1.0


def test_brand_elasticity_matches_numpy(spark, sf_dir, qs):
    import math

    rows = qs["brand_price_elasticity"](spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_discount"
    ).collect()
    brand_of = {r.p_partkey: r.p_brand for r in
                read_table(spark, sf_dir, "part").collect()}
    per = defaultdict(list)
    for x in li:
        per[brand_of[x.l_partkey]].append(
            (round(math.log(1.0 - x.l_discount), 9),
             round(math.log(x.l_quantity), 9))
        )
    top = sorted(per.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:10]
    assert [(r.brand, r.n_lines) for r in rows] == [(b, len(v)) for b, v in top]
    import numpy as np

    for r, (b, v) in zip(rows, top):
        xs = np.array([x for x, _ in v])
        ys = np.array([y for _, y in v])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(r.elasticity - slope) < 1e-4
        assert abs(r.log_base_qty - intercept) < 1e-4


def test_wasserstein_matches_scipy_quantile_form(spark, sf_dir, qs):
    import math

    rows = {r.source: r for r in
            qs["wasserstein_shard_drift"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "text"
    ).collect()
    tok_re = re.compile(r"[^a-z0-9]+")
    per = [(d.source, d.doc_id, len([t for t in tok_re.split(d.text.lower()) if t]))
           for d in docs]
    pooled = sorted((l, did) for _, did, l in per)
    N = len(pooled)
    by_src = defaultdict(list)
    for s, did, l in per:
        by_src[s].append((l, did))
    assert set(rows) == set(by_src)
    for s, members in by_src.items():
        members.sort()
        ns = len(members)
        moved = sum(
            abs(members[rs - 1][0] - pooled[math.ceil(rs * N / ns) - 1][0])
            for rs in range(1, ns + 1)
        )
        r = rows[s]
        assert (r.n_docs, r.total_moved_tokens) == (ns, moved)
        assert r.w1_ppm_tokens == moved * 1_000_000 // ns
        assert r.total_moved_tokens >= 0


def test_kalman_matches_independent_recurrence(spark, sf_dir, qs):
    import math

    rows = sorted(qs["kalman_local_level"](spark, sf_dir).collect(), key=lambda r: r.d)
    daily = sorted(
        (rr.date, round(rr.total_revenue * 100))
        for rr in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    level = var = None
    hist = []
    for d, c in daily:
        y = float(c)
        if level is None:
            level, var, k = y, 1e12, 0.0
        else:
            pvar = var + 1e10
            k = pvar / (pvar + 1e12)
            level = level + k * (y - level)
            var = (1.0 - k) * pvar
        hist.append((d, y / 100.0, level / 100.0, k,
                     1.959963984540054 * math.sqrt(var) / 100.0))
    assert len(rows) == 30
    for r, (d, y, lv, k, band) in zip(rows, hist[-30:]):
        assert r.d == d
        assert r.y == y and r.level == lv  # bit-exact
        assert r.gain == k and r.band == band
    # gain converges to the steady state of the local-level model
    assert abs(rows[-1].gain - 0.09512492197250394) < 1e-12


def test_lttb_matches_independent_implementation(spark, sf_dir, qs):
    rows = sorted(qs["lttb_downsample_daily"](spark, sf_dir).collect(),
                  key=lambda r: r.k)
    daily = sorted(
        (rr.date, round(rr.total_revenue * 100))
        for rr in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    n = len(daily)
    ys = [c for _, c in daily]
    bucket_of = lambda rn: (0 if rn == 1 else
                            (26 if rn == n else 1 + (rn - 2) * 25 // (n - 2)))
    members = defaultdict(list)
    for rn in range(1, n + 1):
        members[bucket_of(rn)].append(rn)
    avgs = {b: (sum(m) / len(m), sum(ys[r - 1] for r in m) / len(m))
            for b, m in members.items()}
    sel = [1]
    sx, sy = 1.0, float(ys[0])
    for k in range(1, 26):
        ax, ay = avgs[k + 1]
        best = None
        for rn in members[k]:
            x, y = float(rn), float(ys[rn - 1])
            area2 = abs((sx - ax) * (y - sy) - (sx - x) * (ay - sy))
            if best is None or area2 > best[0]:
                best = (area2, rn, x, y)
        sel.append(best[1])
        sx, sy = best[2], best[3]
    sel.append(n)
    assert [r.k for r in rows] == list(range(27))
    assert [r.d for r in rows] == [daily[rn - 1][0] for rn in sel]
    assert [r.revenue for r in rows] == [round(ys[rn - 1] / 100, 2) for rn in sel]
    # anchors always kept
    assert rows[0].d == daily[0][0] and rows[-1].d == daily[-1][0]


def test_time_decayed_avg_matches_python(spark, sf_dir, qs):
    import math

    rows = {r.event_type: r for r in
            qs["time_decayed_value_avg"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    tmax = max(e.ts for e in ev)
    tau = 7 * 86400 * 1e6
    agg = defaultdict(lambda: [0, 0.0, 0.0])
    for e in ev:
        dt = (tmax - e.ts).total_seconds() * 1e6
        w = round(math.exp(-dt / tau), 12)
        a = agg[e.event_type]
        a[0] += 1
        a[1] += round(w * round(e.value, 6), 12)
        a[2] += w
    assert set(rows) == set(agg)
    for et, (ne, sv, sw) in agg.items():
        r = rows[et]
        assert r.n_events == ne
        assert abs(r.decayed_avg - round(sv / sw, 6)) < 2e-6
        assert abs(r.effective_n - round(sw, 6)) < 2e-6
        # decay weights are at most 1: effective sample <= raw count
        assert r.effective_n <= ne
