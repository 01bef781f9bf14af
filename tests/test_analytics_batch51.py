"""Round-3 wave 17: JSON round-trip parity, base64/hex encoding family,
Count-Min sketch error audit. Pure-Python recomputes keep both engines
honest."""

from __future__ import annotations

import base64
import hashlib
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_json_roundtrip_all_rows_exact(spark, sf_dir, qs):
    r = qs["json_roundtrip_report"](spark, sf_dir).collect()[0]
    n = read_table(spark, sf_dir, "orders").count()
    # every row must encode compactly AND re-extract identically
    assert r.n == n
    assert r.n_exact_encoding == n
    assert r.n_key_roundtrip == n
    assert r.n_priority_roundtrip == n
    assert r.n_year_roundtrip == n


def test_binary_encoding_matches_python(spark, sf_dir, qs):
    out = qs["binary_encoding_report"](spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in read_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    for r in out[:200]:
        d = hashlib.md5(docs[r.doc_id].encode()).digest()
        assert r.hex == d.hex().upper()
        assert r.b64 == base64.b64encode(d).decode()
        assert r.b64_roundtrip_ok == 1
        assert r.hex_len == 32 and r.b64_len == 24


def test_countmin_error_report_one_sided(spark, sf_dir, qs):
    out = {r.event_type: r for r in
           qs["countmin_error_report"](spark, sf_dir).collect()}
    exact = defaultdict(int)
    for r in read_table(spark, sf_dir, "events").select(
            "event_type").collect():
        exact[r.event_type] += 1

    def col_for(r, key):
        h = hashlib.md5(f"cms{r}_{key}".encode()).hexdigest()[:8]
        return int(h, 16) % 16

    cells = defaultdict(int)
    for key, c in exact.items():
        for r in range(4):
            cells[(r, col_for(r, key))] += c
    assert set(out) == set(exact)
    for key, c in exact.items():
        est = min(cells[(r, col_for(r, key))] for r in range(4))
        row = out[key]
        assert row.exact == c
        assert row.cms_estimate == est
        # CMS error is one-sided: never underestimates
        assert row.overestimate == est - c >= 0
        assert row.overest_ppm == (est - c) * 1000000 // c
