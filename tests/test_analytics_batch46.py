"""Round-3 wave 12: bag-semantics set operators and matryoshka
truncation fidelity. Pure-Python recomputes keep both engines honest."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_bag_set_ops_matches_counter_identity(spark, sf_dir, qs):
    r = qs["bag_set_ops_priorities"](spark, sf_dir).collect()[0]
    a = Counter()
    b = Counter()
    for x in read_table(spark, sf_dir, "orders").select(
            "o_orderdate", "o_orderpriority").collect():
        y = x.o_orderdate.year
        if y == 1996:
            a[x.o_orderpriority] += 1
        elif y == 1997:
            b[x.o_orderpriority] += 1
    assert r.n_1996 == sum(a.values())
    assert r.n_1997 == sum(b.values())
    # Counter's &/- are exactly INTERSECT ALL / EXCEPT ALL
    assert r.intersect_all == sum((a & b).values())
    assert r.except_all_1996 == sum((a - b).values())
    assert r.except_all_1997 == sum((b - a).values())
    assert r.intersect_distinct == len(set(a) & set(b))
    assert r.except_distinct_1996 == len(set(a) - set(b))
    # bag identities
    assert r.n_1996 == r.intersect_all + r.except_all_1996
    assert r.n_1997 == r.intersect_all + r.except_all_1997


def test_matryoshka_truncation_matches_python(spark, sf_dir, qs):
    out = {r.dims: r for r in
           qs["matryoshka_truncation_report"](spark, sf_dir).collect()}
    vecs = {r.vec_id: list(r.embedding) for r in read_table(
        spark, sf_dir, "embeddings").collect() if r.vec_id < 20}

    def cos(u, v):
        dot = sum(x * y for x, y in zip(u, v))
        return dot / (math.sqrt(sum(x * x for x in u))
                      * math.sqrt(sum(y * y for y in v)))

    ids = sorted(vecs)
    assert set(out) == {8, 16, 32, 64}
    for d in (8, 16, 64):
        deltas = []
        for i, ia in enumerate(ids):
            for ib in ids[i + 1:]:
                va, vb = vecs[ia], vecs[ib]
                deltas.append(
                    abs(cos(va[:d], vb[:d]) - cos(va, vb))
                )
        r = out[d]
        assert r.n_pairs == len(deltas)
        assert math.isclose(
            r.mean_abs_delta, sum(deltas) / len(deltas), abs_tol=1e-5
        )
        assert math.isclose(r.max_abs_delta, max(deltas), abs_tol=1e-5)
    # fidelity improves monotonically with kept dims; 64 == full == 0
    assert out[64].max_abs_delta == 0.0
    assert out[8].mean_abs_delta >= out[16].mean_abs_delta >= \
        out[32].mean_abs_delta >= 0.0
