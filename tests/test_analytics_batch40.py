"""Round-3 wave 5: sequenceMatch pattern classes, entropy() aggregate,
substring-search family, and transform()/multiIf mapping.
Pure-Python recomputes keep both engines honest."""

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


def test_sequence_match_flags_matches_python(spark, sf_dir, qs):
    r = qs["sequence_match_flags"](spark, sf_dir).collect()[0]
    import calendar

    per = defaultdict(list)
    for e in read_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type").collect():
        per[e.user_id].append(
            (calendar.timegm(e.ts.timetuple()), e.event_id, e.event_type)
        )
    n_any = n_adj = n_time = 0
    for evs in per.values():
        evs.sort()
        t = [x[2] for x in evs]
        s = [x[0] for x in evs]
        views = [i for i, x in enumerate(t) if x == "view"]
        purch = [i for i, x in enumerate(t) if x == "purchase"]
        if views and purch and max(purch) > min(views):
            n_any += 1
        if any(t[i] == "view" and t[i + 1] == "purchase"
               for i in range(len(t) - 1)):
            n_adj += 1
        if any(t[i] == "view" and t[j] == "purchase"
               and s[j] - s[i] <= 3600
               for i in range(len(t)) for j in range(i + 1, len(t))):
            n_time += 1
    assert r.n_users == len(per)
    assert r.n_match_any == n_any
    assert r.n_match_adjacent == n_adj
    assert r.n_match_within_1h == n_time
    # both restricted classes are subsets of the any-order match
    # (adjacency is NOT a subset of within-1h: neighbors can be hours
    # apart)
    assert r.n_match_adjacent <= r.n_match_any
    assert r.n_match_within_1h <= r.n_match_any


def test_entropy_by_column_matches_python(spark, sf_dir, qs):
    out = {r.column_name: r for r in
           qs["entropy_by_column"](spark, sf_dir).collect()}
    specs = [
        ("orders", "o_orderpriority"),
        ("orders", "o_orderstatus"),
        ("customer", "c_mktsegment"),
        ("lineitem", "l_returnflag"),
    ]
    for tbl, col in specs:
        vals = [getattr(r, col) for r in
                read_table(spark, sf_dir, tbl).select(col).collect()]
        counts = defaultdict(int)
        for v in vals:
            counts[v] += 1
        n = len(vals)
        ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
        r = out[f"{tbl}.{col}"]
        assert r.n_rows == n
        assert r.n_distinct == len(counts)
        assert math.isclose(r.entropy_bits, ent, abs_tol=1e-5)
        assert math.isclose(
            r.norm_entropy, ent / math.log2(len(counts)), abs_tol=1e-5
        )
        assert 0.0 <= r.norm_entropy <= 1.0


def test_substring_search_family_matches_python(spark, sf_dir, qs):
    out = qs["substring_search_family"](spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in read_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    for r in out:
        text = docs[r.doc_id]
        assert r.pos_data == text.find("data") + 1
        assert r.n_data == text.count("data")
        assert r.has_token_spark == int(
            re.search(r"\bspark\b", text) is not None
        )
        assert r.starts_the == int(text.startswith("the "))
        assert r.ends_join == int(text.endswith("join"))


def test_transform_mapping_report_matches_python(spark, sf_dir, qs):
    out = {r.yyyymm: r for r in
           qs["transform_mapping_report"](spark, sf_dir).collect()}
    w_map = {"1-URGENT": 100, "2-HIGH": 50, "3-MEDIUM": 25}
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in read_table(spark, sf_dir, "orders").select(
            "o_orderdate", "o_orderpriority", "o_totalprice").collect():
        d = r.o_orderdate.date()
        key = d.year * 100 + d.month
        a = agg[key]
        a[0] += w_map.get(r.o_orderpriority, 10)
        p = r.o_totalprice
        if p >= 300000:
            a[1] += 1
        elif p >= 150000:
            a[2] += 1
        elif p >= 50000:
            a[3] += 1
        else:
            a[4] += 1
    assert set(out) == set(agg)
    for k, a in agg.items():
        r = out[k]
        assert [r.urgency_score, r.n_jumbo, r.n_large, r.n_medium,
                r.n_small] == a
