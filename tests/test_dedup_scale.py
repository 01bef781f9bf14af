"""Dedup at fan-out scale (r5 VERDICT #3) — the forecast_scale treatment
applied to the LSH family.

A deterministic synthetic corpus with a PLANTED duplicate structure (per
10-doc group: 8 unique, 1 near-dup at Jaccard ≈ 0.9, 1 exact dup) runs the
full shingle → minhash → band-join → verify pipeline at 15k/30k/60k docs.
Pinned: exact-dup recovery is total (identical signature ⇒ all bands
collide — a MUST, not a probability), candidate-pair volume grows linearly
in docs (the LSH contract; an all-pairs regression would grow 4× per
doubling), band-bucket occupancy stays constant (no hot bucket), and the
whole pipeline plans without a single-partition collapse. The same frame at
2k docs is hash-gated against a DuckDB full-pipeline replay
(dedup_scale_contract_audit in the registry)."""

from __future__ import annotations

import pytest

from clickhouse_forecasting_spark.queries import (
    dedup_scale_audit_frame,
    synth_dedup_corpus,
)


@pytest.fixture(scope="module")
def audits(spark):
    return {
        n: dedup_scale_audit_frame(spark, n).collect()[0].asDict()
        for n in (15_000, 30_000, 60_000)
    }


def test_exact_dup_recovery_is_total(audits):
    for n, a in audits.items():
        assert a["n_exact_pairs"] == n // 10, (n, a)


def test_candidate_growth_is_linear(audits):
    r1 = audits[30_000]["n_candidates"] / audits[15_000]["n_candidates"]
    r2 = audits[60_000]["n_candidates"] / audits[30_000]["n_candidates"]
    assert 1.9 <= r1 <= 2.1 and 1.9 <= r2 <= 2.1, (r1, r2)


def test_band_occupancy_constant(audits):
    # planted groups put at most 3 docs (base, near, exact) in a bucket;
    # occupancy must not grow with corpus size
    for n, a in audits.items():
        assert a["max_band_occupancy"] <= 4, (n, a)


def test_no_cross_group_blowup(audits):
    # cross-group candidates are md5 band-collision accidents — bounded,
    # never a function of corpus size
    for n, a in audits.items():
        assert a["n_cross_group"] <= n // 1000, (n, a)


def test_near_dup_recovery_tracks_banding_law(audits):
    # per group: 3 plantable pairs (base-near, base-exact, near-exact);
    # exact is guaranteed, the two near pairs collide per 1-(1-j^r)^b
    # ≈ 0.99 at j≈0.9, r=4, b=4 — recovery must stay near-total
    for n, a in audits.items():
        planted = 3 * (n // 10)
        assert a["n_intra_group"] >= 0.95 * planted, (n, a)


def test_scale_pipeline_plans_distributed(spark):
    from clickhouse_forecasting_spark.plans import single_partition_collapses

    df = dedup_scale_audit_frame(spark, 15_000)
    assert single_partition_collapses(df) == []


def test_corpus_generator_contract(spark):
    docs = synth_dedup_corpus(spark, 100).collect()
    by_id = {r.doc_id: r.text for r in docs}
    assert len(by_id) == 100
    for base in range(0, 100, 10):
        assert by_id[base + 9] == by_id[base]  # planted exact dup
        near, orig = by_id[base + 8], by_id[base]
        assert near != orig
        # near-dup differs in exactly the last token
        assert near.rsplit(" ", 1)[0] == orig.rsplit(" ", 1)[0]
