"""Round-3 wave 11: Heaps'-law vocab growth and JL projection
distortion. Pure-Python recomputes keep both engines honest."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_heaps_law_vocab_growth_matches_python(spark, sf_dir, qs):
    out = qs["heaps_law_vocab_growth"](spark, sf_dir).collect()
    docs = sorted(
        (r.doc_id, r.text)
        for r in read_table(spark, sf_dir, "documents").select(
            "doc_id", "text").collect()
    )
    seen = set()
    cum_tokens = cum_vocab = 0
    cps = {}
    for doc_id, text in docs:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        cum_tokens += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                cum_vocab += 1
        if doc_id % 50 == 49:
            cps[doc_id] = (cum_tokens, cum_vocab)
    assert {r.doc_id for r in out} == set(cps)
    xs, ys = [], []
    for r in out:
        ct, cv = cps[r.doc_id]
        assert (r.cum_tokens, r.cum_vocab) == (ct, cv)
        xs.append(math.log(ct))
        ys.append(math.log(cv))
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    for r in out:
        assert math.isclose(r.heaps_beta, beta, abs_tol=1e-5)
        # sublinear growth is the Heaps'-law signature; the synthetic
        # corpus has a ~31-word closed vocabulary, so β saturates to 0
        assert 0.0 <= r.heaps_beta < 1.0


def test_jl_projection_distortion_matches_python(spark, sf_dir, qs):
    out = qs["jl_projection_distortion"](spark, sf_dir).collect()
    vecs = {r.vec_id: list(r.embedding) for r in read_table(
        spark, sf_dir, "embeddings").collect() if r.vec_id < 20}
    assert len(out) == 20 * 19 // 2

    def sign(p, i):
        h = hashlib.md5(f"jl_{p}_{i}".encode()).hexdigest()[:2]
        return 1.0 if int(h, 16) % 2 == 0 else -1.0

    projs = {
        vid: [
            sum(v[i - 1] * sign(p, i) for i in range(1, len(v) + 1))
            / math.sqrt(8.0)
            for p in range(8)
        ]
        for vid, v in vecs.items()
    }
    ratios = []
    for r in out:
        va, vb = vecs[r.id_a], vecs[r.id_b]
        d_orig = math.sqrt(sum((x - y) ** 2 for x, y in zip(va, vb)))
        pa, pb = projs[r.id_a], projs[r.id_b]
        d_proj = math.sqrt(sum((x - y) ** 2 for x, y in zip(pa, pb)))
        assert math.isclose(r.l2_orig, d_orig, rel_tol=1e-5, abs_tol=1e-5)
        assert math.isclose(r.l2_proj, d_proj, rel_tol=1e-5, abs_tol=1e-5)
        ratios.append(r.distortion)
    # JL with 8 dims is lossy but centered: mean ratio near 1, spread real
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.4
    assert max(ratios) > min(ratios)
