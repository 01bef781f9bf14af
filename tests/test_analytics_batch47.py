"""Round-3 wave 13: dedup threshold ROI sweep. Pure-Python recompute
of the verified-pair sweep keeps both engines honest."""

from __future__ import annotations

import pytest

from clickhouse_forecasting_spark.functions import dedup as DD
from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_dedup_threshold_sweep_monotone_and_consistent(spark, sf_dir, qs):
    out = {r.threshold_pct: r for r in
           qs["dedup_threshold_sweep"](spark, sf_dir).collect()}
    assert set(out) == {50, 60, 70, 80, 90}
    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    pairs = [(r.id_a, r.id_b, r.jaccard) for r in DD.lsh_verified_pairs(
        docs, threshold=0.5, cache_key=sf_dir).collect()]
    prev_pairs = prev_removed = None
    for t in (50, 60, 70, 80, 90):
        r = out[t]
        kept = [(a, b) for a, b, j in pairs if j >= t / 100.0]
        assert r.n_pairs == len(kept)
        assert r.n_docs_removed == len({b for _, b in kept})
        assert r.n_total_docs == n_docs
        assert r.survivor_ppm == (n_docs - r.n_docs_removed) * 1000000 \
            // n_docs
        # higher threshold -> monotonically fewer pairs and removals
        if prev_pairs is not None:
            assert r.n_pairs <= prev_pairs
            assert r.n_docs_removed <= prev_removed
        prev_pairs, prev_removed = r.n_pairs, r.n_docs_removed
    # fixture near-dups are near-exact (all pairs ≥0.9 at sf0.001), so
    # equality is legitimate; the curve may only tighten, never grow
    assert out[50].n_pairs >= out[90].n_pairs > 0
