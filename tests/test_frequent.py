"""Misra-Gries support-threshold heavy hitters: completeness guarantee
under forced eviction, and exactness of the reported counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.functions.frequent import (
    frequent_above_support,
    misra_gries_candidates,
)
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_support_set_equals_exact(spark, sf_dir, qs):
    got = {
        r.l_partkey: r.n
        for r in qs["frequent_parts_sketch"](spark, sf_dir).collect()
    }
    li = read_table(spark, sf_dir, "lineitem")
    total = li.count()
    exact = {
        r.l_partkey: r.n
        for r in li.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .filter(32768 * F.col("n") > total)
        .collect()
    }
    assert got == exact


def test_guarantee_survives_eviction(spark):
    """Key universe far larger than k_sketch forces the decrement path;
    the heavy key must still surface with its exact count."""
    n_noise, n_heavy = 20_000, 6_000
    noise = spark.range(n_noise).select((F.col("id") % 10_000).alias("k"))
    heavy = spark.range(n_heavy).select(F.lit(-1).alias("k"))
    df = noise.union(heavy).repartition(8)
    out = {r.k: r.n for r in frequent_above_support(df, "k", k_sketch=64).collect()}
    # heavy key holds ~23% of rows >> n/64; noise keys hold ~0.008% each
    assert out == {-1: n_heavy}
    # sketch candidates stayed bounded: at most partitions * k_sketch
    n_cands = misra_gries_candidates(df, "k", k_sketch=64).count()
    assert n_cands <= 8 * 64
