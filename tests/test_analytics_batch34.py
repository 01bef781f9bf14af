"""Round-3 wave 7: CCNet-style cross-doc paragraph dedup, dictGet
dictionary-lookup parity, and the IPv4-function family. Pure-Python
recomputes keep both engines honest (the DuckDB twin is checked by
tools/check_oracle.py; these tests re-derive the answers a third way)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_dedup_paragraph_ccnet_matches_python_fold(spark, sf_dir, qs):
    rows = {(r.source, r.lang): r for r in
            qs["dedup_paragraph_ccnet"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text").collect()
    K = 12
    seen = set()
    agg = defaultdict(lambda: {"docs": 0, "chunks": 0, "dups": 0,
                               "toks": 0, "removed": 0})
    # global first-occurrence order = (doc_id, idx); iterate sorted
    per_group_docs = defaultdict(set)
    for d in sorted(docs, key=lambda x: x.doc_id):
        toks = d.text.split(" ")
        a = agg[(d.source, d.lang)]
        per_group_docs[(d.source, d.lang)].add(d.doc_id)
        for i in range(0, -(-len(toks) // K)):
            ch = " ".join(toks[i * K:(i + 1) * K])
            n = len(toks[i * K:(i + 1) * K])
            a["chunks"] += 1
            a["toks"] += n
            if ch in seen:
                a["dups"] += 1
                a["removed"] += n
            else:
                seen.add(ch)
    assert set(rows) == set(agg)
    for k, a in agg.items():
        r = rows[k]
        assert r.n_docs == len(per_group_docs[k])
        assert (r.n_chunks, r.dup_chunks) == (a["chunks"], a["dups"])
        assert (r.toks_total, r.toks_removed) == (a["toks"], a["removed"])
        assert r.retained_ppm == (a["toks"] - a["removed"]) * 1000000 // a["toks"]
        assert 0 < r.retained_ppm <= 1000000


def test_dict_get_enrichment_defaults_and_hierarchy(spark, sf_dir, qs):
    rows = qs["dict_get_enrichment"](spark, sf_dir).collect()
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal").collect()
    nation = {x.n_nationkey: (x.n_name, x.n_regionkey) for x in
              read_table(spark, sf_dir, "nation").collect()}
    region = {x.r_regionkey: x.r_name for x in
              read_table(spark, sf_dir, "region").collect()}
    agg = defaultdict(lambda: [0, 0])
    for c in cust:
        p = c.c_custkey % 30
        if p in nation:
            nname, rk = nation[p]
            rname = region.get(rk, "NONE")
        else:
            nname, rname = "UNKNOWN", "NONE"
        a = agg[(rname, nname)]
        a[0] += 1
        a[1] += round(c.c_acctbal * 100)
    got = {(r.region_name, r.nation_name): r for r in rows}
    assert set(got) == set(agg)
    for k, (n, cents) in agg.items():
        r = got[k]
        assert r.n_customers == n
        assert abs(r.sum_bal - cents / 100.0) < 1e-6
    # misses exist (keys 25-29) and resolve to the defaults
    assert ("NONE", "UNKNOWN") in got
    # every real nation resolves to its real region
    for (rname, nname) in got:
        if nname != "UNKNOWN":
            nk = next(k for k, v in nation.items() if v[0] == nname)
            assert region[nation[nk][1]] == rname


def test_ipv4_subnet_report_roundtrip_and_cidr(spark, sf_dir, qs):
    rows = qs["ipv4_subnet_report"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select("user_id").collect()
    agg = defaultdict(lambda: {"n": 0, "users": set(), "nums": [],
                               "cidr": 0})
    lo, hi = 10 * 16777216 + 32 * 256, 10 * 16777216 + 32 * 256 + 8191
    for e in ev:
        h = (e.user_id * 2654435761) % 16777216
        o2, o3, o4 = h // 65536, (h // 256) % 256, h % 256
        num = 10 * 16777216 + h
        sub = f"10.{o2}.{o3}.0"
        a = agg[sub]
        a["n"] += 1
        a["users"].add(e.user_id)
        a["nums"].append(num)
        a["cidr"] += lo <= num <= hi
    got = {r.subnet24: r for r in rows}
    assert set(got) == set(agg)
    for sub, a in agg.items():
        r = got[sub]
        assert r.n_events == a["n"]
        assert r.n_users == len(a["users"])
        assert (r.min_num, r.max_num) == (min(a["nums"]), max(a["nums"]))
        assert r.n_in_cidr == a["cidr"]
    # output is ordered by numeric address, not string
    nums = [r.min_num for r in rows]
    assert nums == sorted(nums)
