"""Round-3 wave 22: PPM registry-dispatch pipeline parity and
aggregate-based top-k. Pure-Python recomputes keep both engines
honest."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_multimodal_ppm_features_container_independent(spark, sf_dir, qs):
    ppm = {r.doc_id: r for r in
           qs["multimodal_ppm_features"](spark, sf_dir).collect()}
    bmp = {r.doc_id: r for r in
           qs["multimodal_image_features"](spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in read_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    assert set(ppm) == set(bmp) == set(docs)
    for doc_id, r in ppm.items():
        # identical pixels -> identical features regardless of container
        b = bmp[doc_id]
        assert (r.feat_mean, r.width, r.height) == (
            b.feat_mean, b.width, b.height)
        digest = hashlib.md5(docs[doc_id].encode()).digest()
        rgb = (digest * 3)[:48]
        assert r.feat_mean == round(sum(rgb) / 48, 6)
        assert (r.width, r.height) == (4, 4)


def test_topk_by_aggregation_matches_window_semantics(spark, sf_dir, qs):
    out = qs["topk_by_aggregation"](spark, sf_dir).collect()
    per = defaultdict(list)
    for r in read_table(spark, sf_dir, "customer").select(
            "c_nationkey", "c_custkey", "c_acctbal").collect():
        per[r.c_nationkey].append(
            (-round(r.c_acctbal * 100), r.c_custkey)
        )
    got = defaultdict(list)
    for r in out:
        got[r.nationkey].append((r.rnk, r.custkey, r.cents))
    assert set(got) == set(per)
    for nk, members in per.items():
        members.sort()
        want = [
            (i + 1, ck, -neg) for i, (neg, ck) in enumerate(members[:3])
        ]
        assert sorted(got[nk]) == want
