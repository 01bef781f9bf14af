"""Round-3 wave 2: meanZTest, maxIntersections(Position), array round-2
(arrayEnumerateUniq/Intersect/Rotate), string hamming/char-Jaccard, and
Gopher quality rules. Pure-Python recomputes keep both engines honest."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_mean_z_test_pairs_matches_python(spark, sf_dir, qs):
    out = qs["mean_z_test_pairs"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    per = defaultdict(list)
    for e in ev:
        per[e.event_type].append(round(e.value * 1e6))
    stats = {}
    for t, xs in per.items():
        n = len(xs)
        mean = sum(xs) / n / 1e6
        varp = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * n) / 1e12
        stats[t] = (n, mean, varp)
    assert len(out) == len(stats) * (len(stats) - 1) // 2
    for r in out:
        na, ma, va = stats[r.type_a]
        nb, mb, vb = stats[r.type_b]
        z = (ma - mb) / math.sqrt(va / na + vb / nb)
        assert r.n_a == na and r.n_b == nb
        assert math.isclose(r.z_score, round(z, 6), abs_tol=1e-6)
        assert r.significant_95 == int(abs(z) > 1.959964)


def test_max_intersections_yearly_matches_sweep(spark, sf_dir, qs):
    out = {r.yr: r for r in
           qs["max_intersections_yearly"](spark, sf_dir).collect()}
    o = {r.o_orderkey: r.o_orderdate.date() for r in
         read_table(spark, sf_dir, "orders").select(
             "o_orderkey", "o_orderdate").collect()}
    close = defaultdict(lambda: None)
    for r in read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate").collect():
        d = r.l_shipdate.date()
        if close[r.l_orderkey] is None or d > close[r.l_orderkey]:
            close[r.l_orderkey] = d
    import datetime

    deltas = defaultdict(lambda: defaultdict(int))
    for k, od in o.items():
        cd = close.get(k)
        if cd is None:
            continue
        cd = max(cd, od)
        for yr in range(od.year, cd.year + 1):
            s = max(od, datetime.date(yr, 1, 1))
            e = min(cd, datetime.date(yr, 12, 31))
            deltas[yr][s] += 1
            deltas[yr][e + datetime.timedelta(days=1)] -= 1
    for yr, dd in deltas.items():
        run, best, best_day = 0, -1, None
        for day in sorted(dd):
            run += dd[day]
            if day.year != yr:
                continue
            if run > best:
                best, best_day = run, day
        assert out[yr].max_intersections == best
        assert out[yr].first_peak_day == best_day


def test_array_enumerate_uniq_matches_python(spark, sf_dir, qs):
    out = qs["array_enumerate_uniq"](spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in read_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    stop = {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"}
    for r in out:
        toks = [t for t in re.split("[^a-z0-9]+", docs[r.doc_id].lower()) if t]
        head = toks[:50]
        occ = defaultdict(int)
        mx = 0
        for t in head:
            occ[t] += 1
            mx = max(mx, occ[t])
        assert r.n_tokens == len(toks)
        assert r.max_occ_head50 == mx
        assert r.n_stop_distinct == len(set(toks) & stop)
        if toks:
            assert r.rot3_first == toks[3 % len(toks)]


def test_string_hamming_jaccard_matches_python(spark, sf_dir, qs):
    out = qs["string_hamming_jaccard"](spark, sf_dir).collect()
    names = [r.n_name for r in read_table(
        spark, sf_dir, "nation").select("n_name").collect()]
    assert len(out) == len(names) * (len(names) - 1) // 2
    byk = {(r.name_a, r.name_b): r for r in out}
    for a in names:
        for b in names:
            if not a < b:
                continue
            pa = (a[:12] + "#" * 12)[:12]
            pb = (b[:12] + "#" * 12)[:12]
            ham = sum(1 for x, y in zip(pa, pb) if x != y)
            ja = len(set(a) & set(b)) / len(set(a) | set(b))
            r = byk[(a, b)]
            assert r.hamming12 == ham
            assert math.isclose(r.jaccard_chars, round(ja, 6), abs_tol=1e-6)


def test_gopher_quality_rules_matches_python(spark, sf_dir, qs):
    out = qs["gopher_quality_rules"](spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in read_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    stop = {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"}
    n_keep = 0
    for r in out:
        text = docs[r.doc_id]
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        n = len(toks)
        mean_len = sum(map(len, toks)) / max(n, 1)
        alpha = sum(1 for t in toks if re.search("[a-z]", t)) / max(n, 1)
        hits = sum(1 for t in toks if t in stop)
        syms = len(re.findall(r"#|\.\.\.|…", text))
        sym_ratio = syms / max(n, 1)
        keep = (50 <= n <= 100000 and 3 <= mean_len <= 10
                and alpha >= 0.8 and hits >= 2 and sym_ratio < 0.1)
        assert r.n_words == n
        assert math.isclose(r.mean_word_len, round(mean_len, 6), abs_tol=1e-6)
        assert r.stopword_hits == hits
        assert r.keep == int(keep)
        n_keep += r.keep
    # the rule set must actually separate the corpus, not pass everything
    assert 0 < n_keep < len(out)
