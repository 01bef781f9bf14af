"""The dedup family's shared-stage cache: one corpus pass per run."""

from __future__ import annotations

from clickhouse_forecasting_spark.functions import dedup as DD
from clickhouse_forecasting_spark.sources import read_table


def test_banded_signatures_cache_reuses_persisted_stage(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = DD.banded_signatures(docs, cache_key="t-cache")
    b = DD.banded_signatures(docs, cache_key="t-cache")
    assert a is b  # same persisted DataFrame, not a rebuilt plan
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    # different params -> different cache entry
    c = DD.banded_signatures(docs, cache_key="t-cache", bands=8, num_hashes=16)
    assert c is not a
    # no cache_key -> a fresh plan object (Spark's CacheManager may still
    # serve it from the persisted stage via plan matching — that's the
    # desired behavior, so storage level is not asserted here)
    d = DD.banded_signatures(docs)
    assert d is not a


def test_shared_stage_results_identical_to_uncached(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    cached = DD.lsh_verified_pairs(docs, threshold=0.8, cache_key="t-eq")
    fresh = DD.lsh_verified_pairs(docs, threshold=0.8)
    got = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in cached.collect()}
    want = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in fresh.collect()}
    assert got == want and got
