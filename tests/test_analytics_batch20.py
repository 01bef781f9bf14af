"""Semantic invariants for the batch-20 query (Spearman/Kendall rank
correlation). Cross-engine value equality is covered by the DuckDB
oracle gate; here scipy (or a python twin) pins the statistics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


def test_rank_correlation_matches_reference(spark, sf_dir):
    qs = entry.queries()
    row = qs["rank_correlation_nations"](spark, sf_dir).collect()[0]
    per_nation = (
        read_table(spark, sf_dir, "orders")
        .join(read_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(read_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    )
    xs = [(r.n_orders, r.n_name) for r in per_nation]
    ys = [(r.cents, r.n_name) for r in per_nation]
    names = [r.n_name for r in per_nation]
    rx = {name: i + 1 for i, (_, name) in enumerate(sorted(xs))}
    ry = {name: i + 1 for i, (_, name) in enumerate(sorted(ys))}
    n = len(names)
    sum_d2 = sum((rx[m] - ry[m]) ** 2 for m in names)
    rho = 1 - 6 * sum_d2 / (n * (n * n - 1))
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            a, b = names[i], names[j]
            if (rx[a] < rx[b]) == (ry[a] < ry[b]):
                conc += 1
            else:
                disc += 1
    tau = (conc - disc) / (conc + disc)
    assert (row.n, row.sum_d2) == (n, sum_d2)
    assert (row.n_conc, row.n_disc) == (conc, disc)
    assert row.spearman_rho == pytest.approx(rho, abs=2e-6)
    assert row.kendall_tau == pytest.approx(tau, abs=2e-6)
    assert -1.0 <= row.spearman_rho <= 1.0 and -1.0 <= row.kendall_tau <= 1.0
    try:
        from scipy.stats import kendalltau, spearmanr

        # custkey/name tie-breaks give distinct ranks, so scipy's
        # tie-free formulas agree
        xv = [rx[m] for m in names]
        yv = [ry[m] for m in names]
        assert row.spearman_rho == pytest.approx(spearmanr(xv, yv).statistic, abs=1e-6)
        assert row.kendall_tau == pytest.approx(kendalltau(xv, yv).statistic, abs=1e-6)
    except ImportError:
        pass
