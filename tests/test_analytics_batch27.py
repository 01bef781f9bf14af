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
