"""PageRank operator: parity with a numpy power-iteration reference and
structural invariants (mass conservation, dangling handling).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n_ids, iters, damping):
    ids = sorted(n_ids)
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out_w = {}
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        dangling = sum(r[pos[v]] for v in ids if v not in out_w)
        nxt += damping * dangling / n
        for s, d, w in edges:
            nxt[pos[d]] += damping * r[pos[s]] * (w / out_w[s])
        r = nxt
    return {v: r[pos[v]] for v in ids}


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = [
        (0, 1, 2.0),
        (0, 2, 1.0),
        (1, 2, 1.0),
        (2, 0, 1.0),
        (3, 2, 5.0),  # node 3 has no in-edges
        (2, 4, 1.0),  # node 4 is dangling (no out-edges)
    ]
    df = spark.createDataFrame(edges, "src int, dst int, volume double")
    got = {
        r.node: r.rank
        for r in pagerank(df, weight="volume", iterations=12).collect()
    }
    want = _numpy_pagerank(edges, {0, 1, 2, 3, 4}, 12, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_uniform_on_symmetric_cycle(spark):
    cyc = [(i, (i + 1) % 4, 1.0) for i in range(4)]
    df = spark.createDataFrame(cyc, "src int, dst int, volume double")
    ranks = [r.rank for r in pagerank(df, weight="volume", iterations=20).collect()]
    for r in ranks:
        assert r == pytest.approx(0.25, abs=1e-12)


def test_pagerank_trade_graph_query(spark, sf_dir):
    res = entry.queries()["pagerank_trade_graph"](spark, sf_dir).collect()
    assert len(res) == 25  # every nation trades
    total = sum(r.rank for r in res)
    assert total == pytest.approx(1.0, abs=1e-4)  # 6dp rounding slack
    assert all(r.rank > 0 for r in res)
