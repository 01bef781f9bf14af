"""Semantic invariants for the batch-19 queries (Dice collocations,
per-dimension embedding medians). Cross-engine value equality is covered
by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_dice_matches_python(spark, sf_dir, qs):
    rows = qs["dice_collocations"](spark, sf_dir).collect()
    assert rows and len(rows) <= 30
    docs = read_table(spark, sf_dir, "documents").select("text").collect()
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for r in docs:
        toks = r.text.split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    for r in rows:
        assert r.n_ab == bi[(r.a, r.b)] and r.n_ab >= 20
        assert r.n_a == uni[r.a] and r.n_b == uni[r.b]
        assert r.dice_ppm == (2 * r.n_ab * 1_000_000) // (r.n_a + r.n_b)
    top = sorted(
        (
            (-(2 * n * 1_000_000) // (uni[a] + uni[b]), a, b)
            for (a, b), n in bi.items()
            if n >= 20
        )
    )[:30]
    assert [(-r.dice_ppm, r.a, r.b) for r in rows] == [
        ((2 * bi[(a, b)] * 1_000_000) // (uni[a] + uni[b]) * -1, a, b)
        for _, a, b in top
    ]


def test_dimension_medians_match_numpy(spark, sf_dir, qs):
    import math

    rows = {r.dim: r for r in qs["embedding_dimension_medians"](spark, sf_dir).collect()}
    em = read_table(spark, sf_dir, "embeddings").collect()
    n_dims = len(em[0].embedding)
    assert set(rows) == set(range(n_dims))
    for d in range(n_dims):
        micros = sorted(
            round(float(r.embedding[d]) * 1_000_000) for r in em
        )
        expect = micros[math.ceil(len(micros) / 2) - 1]
        assert rows[d].median_micro == expect
        assert rows[d].n == len(micros)
