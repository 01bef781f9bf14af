"""Round-3 wave 6: ClickHouse URL-function family and deterministic
Space-Saving ``topKWeighted``. Pure-Python recomputes keep both
engines honest (the DuckDB twin is checked by tools/check_oracle.py;
these tests re-derive the answers a third way)."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_url_functions_report_matches_python_parse(spark, sf_dir, qs):
    rows = {(r.domain, r.tld): r for r in
            qs["url_functions_report"](spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang").collect()
    agg = defaultdict(lambda: {"n": 0, "paths": set(), "cuts": set(),
                               "depth": 0})
    for d in docs:
        url = (f"https://www.{d.source}.example.com/corpus/"
               f"{d.lang}/{d.doc_id}?lang={d.lang}")
        host = re.match(r"^https?://([^/]+)", url).group(1)
        dom = re.sub(r"^www\.", "", host)
        tld = re.search(r"\.([a-z0-9-]+)$", host).group(1)
        path = re.match(r"^https?://[^/]+([^?#]*)", url).group(1)
        cut = re.sub(r"\?[^#]*", "", url)
        depth = len([s for s in path.split("/") if s])
        a = agg[(dom, tld)]
        a["n"] += 1
        a["paths"].add(path)
        a["cuts"].add(cut)
        a["depth"] += depth
    assert set(rows) == set(agg)
    for k, a in agg.items():
        r = rows[k]
        assert r.n_pages == a["n"]
        assert r.n_paths == len(a["paths"])
        assert r.n_cut_urls == len(a["cuts"])
        assert r.mean_depth_ppm == a["depth"] * 1000000 // a["n"]
    # every synthesized URL lives under .com with query stripped exactly
    assert all(k[1] == "com" for k in rows)


def _spacesaving3(events):
    """Reference fold: events = [(t, w)] in replay order; 3 counters;
    victim = min (count, item); victim inherits its count."""
    st = []  # list of [item, count], index = slot
    for t, w in events:
        for s in st:
            if s[0] == t:
                s[1] += w
                break
        else:
            if len(st) < 3:
                st.append([t, w])
            else:
                vi = min(range(3), key=lambda i: (st[i][1], st[i][0]))
                st[vi] = [t, st[vi][1] + w]
    return sorted(((c, i) for i, c in st), key=lambda x: (-x[0], x[1]))


def test_topk_weighted_spacesaving_matches_reference_fold(spark, sf_dir, qs):
    rows = {r.day: r for r in
            qs["topk_weighted_spacesaving"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "ts", "event_id", "event_type", "value").collect()
    per_day = defaultdict(list)
    for x in ev:
        per_day[x.ts.date()].append(
            (x.ts, x.event_id, x.event_type, round(x.value * 100)))
    assert set(rows) == set(per_day)
    for day, evs in per_day.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        ranked = _spacesaving3([(t, w) for _, _, t, w in evs])
        r = rows[day]
        got = [(r.top1_w, r.top1_item), (r.top2_w, r.top2_item),
               (r.top3_w, r.top3_item)]
        got = [(w, i) for w, i in got if i is not None]
        assert got == ranked, day
        # exact leader + telemetry flag
        exact = defaultdict(int)
        for _, _, t, w in evs:
            exact[t] += w
        lead = min(exact.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r.exact_top_item, r.exact_top_w) == lead
        assert r.top1_agrees == (r.top1_item == lead[0])
        # Space-Saving invariant: sketch top-1 weight never underestimates
        # the true weight of the item it reports
        assert r.top1_w >= exact[r.top1_item]
