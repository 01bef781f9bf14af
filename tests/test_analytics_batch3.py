"""Semantic invariants for the batch-3 analytics queries (skyline,
Markov transitions, TWAP). Cross-engine value equality is covered by
the DuckDB oracle gate; these pin the semantics a hash can't explain.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_skyline_is_exactly_the_undominated_set(spark, sf_dir, qs):
    frontier = {
        r.p_partkey for r in qs["skyline_parts"](spark, sf_dir).collect()
    }
    parts = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    # brute-force strict dominance on the fixture: B dominates A iff
    # B is strictly cheaper AND strictly larger
    expected = set()
    for a in parts:
        dominated = any(
            b.p_retailprice < a.p_retailprice and b.p_size > a.p_size
            for b in parts
        )
        if not dominated:
            expected.add(a.p_partkey)
    assert frontier == expected
    assert frontier  # never empty: the cheapest part is always on it


def test_markov_rows_are_probability_distributions(spark, sf_dir, qs):
    rows = qs["markov_transitions"](spark, sf_dir).collect()
    by_src: dict[str, float] = {}
    n_by_src: dict[str, int] = {}
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_src[r.src] = by_src.get(r.src, 0.0) + r.p
        n_by_src[r.src] = n_by_src.get(r.src, 0) + r.n
    for src, total in by_src.items():
        # each src row is a distribution (rounding leaves ~1e-6 slack)
        assert total == pytest.approx(1.0, abs=1e-4), src
    # pair count conservation: every event with a successor appears once
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n_pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .count()
    )
    assert sum(n_by_src.values()) == n_pairs


def test_twap_bounded_by_min_max_and_constant_series(spark, sf_dir, qs):
    res = qs["twap_user_value"](spark, sf_dir)
    rows = res.collect()
    assert rows
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r.user_id]
        # a time-weighted mean is a convex combination of observed values
        # (the last value carries no weight, hence <= not <)
        assert lo - 1e-6 <= r.twap <= hi + 1e-6
        assert r.total_us > 0 and r.n_spans >= 1
