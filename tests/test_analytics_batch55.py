"""Round-3 wave 21: retrieval-evaluation metrics (NDCG@10, MRR,
recall@10). Pure-Python recompute keeps both engines honest."""

from __future__ import annotations

import math

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_retrieval_metrics_matches_python(spark, sf_dir, qs):
    out = {r.q_id: r for r in
           qs["retrieval_metrics_report"](spark, sf_dir).collect()}
    vecs = {r.vec_id: (list(r.embedding), r.label) for r in read_table(
        spark, sf_dir, "embeddings").collect()}
    assert set(out) == {i for i in vecs if i < 20}
    for q_id in out:
        qv, ql = vecs[q_id]
        nq = math.sqrt(sum(x * x for x in qv))
        scored = []
        for vid, (v, lab) in vecs.items():
            if vid == q_id:
                continue
            cos = round(
                sum(a * b for a, b in zip(v, qv))
                / (math.sqrt(sum(a * a for a in v)) * nq),
                6,
            )
            scored.append((-cos, vid, int(lab == ql)))
        scored.sort()
        rels = [rel for _, _, rel in scored]
        n_rel = sum(rels)
        dcg = sum(
            round(1e6 / math.log2(rnk + 1))
            for rnk, rel in enumerate(rels[:10], start=1) if rel
        )
        ideal_k = min(n_rel, 10)
        idcg = sum(
            round(1e6 / math.log2(i + 1)) for i in range(1, ideal_k + 1)
        )
        first = next(i for i, rel in enumerate(rels, start=1) if rel)
        hits = sum(rels[:10])
        r = out[q_id]
        assert r.n_relevant == n_rel
        assert r.dcg_micro == dcg
        assert r.idcg_micro == idcg
        assert r.ndcg_ppm == math.floor(dcg * 1000000 / max(idcg, 1))
        assert r.rr_micro == math.floor(1e6 / first)
        assert r.hits_at_10 == hits
        assert r.recall10_ppm == math.floor(hits * 1e6 / min(n_rel, 10))
        # bounds: NDCG and recall live in [0, 1e6]
        assert 0 <= r.ndcg_ppm <= 1000000
        assert 0 <= r.recall10_ppm <= 1000000
