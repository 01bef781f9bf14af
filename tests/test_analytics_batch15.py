"""Semantic invariants for the batch-15 queries (weighted median,
snapshot diff, embedding clip stats). Cross-engine value equality is
covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_weighted_median_matches_python(spark, sf_dir, qs):
    got = {r.p_brand: r for r in qs["weighted_median_price_by_brand"](spark, sf_dir).collect()}
    assert got
    rows = (
        read_table(spark, sf_dir, "lineitem")
        .join(read_table(spark, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
            F.round(F.col("l_quantity")).cast("bigint").alias("w"),
        )
        .collect()
    )
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append((r.cents, r.w))
    for brand, pts in by_brand.items():
        pts.sort()
        tot = sum(w for _, w in pts)
        cum = 0
        med = None
        for cents, w in pts:
            cum += w
            if 2 * cum >= tot:
                med = cents
                break
        r = got[brand]
        assert r.weighted_median_cents == med
        assert r.total_quantity == tot


def test_snapshot_diff_classes(spark, sf_dir, qs):
    rows = {r.change: r.n for r in qs["snapshot_diff_customer_orders"](spark, sf_dir).collect()}
    # history only grows: nothing is ever removed
    assert "removed" not in rows
    o = read_table(spark, sf_dir, "orders")
    n_all = o.select("o_custkey").distinct().count()
    n_old = (
        o.filter(F.col("o_orderdate").cast("date") < F.lit("1996-01-01").cast("date"))
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert rows.get("added", 0) == n_all - n_old
    assert sum(rows.values()) == n_all
    # customers whose last order predates the cutoff are unchanged
    last = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d")
    )
    n_quiet = last.filter(F.col("last_d") < F.lit("1996-01-01").cast("date")).count()
    assert rows.get("unchanged", 0) == n_quiet


def test_embedding_clip_stats_matches_python(spark, sf_dir, qs):
    got = {r.label: r for r in qs["embedding_clip_stats"](spark, sf_dir).collect()}
    em = read_table(spark, sf_dir, "embeddings").collect()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])
    for r in em:
        a = agg[r.label]
        a[0] += 1
        a[1] += len(r.embedding)
        a[2] += sum(1 for x in r.embedding if abs(float(x)) > 0.2)
    for label, (nv, nd, nc) in agg.items():
        r = got[label]
        assert (r.n_vectors, r.total_dims, r.total_clip) == (nv, nd, nc)
        assert r.clip_ppm == (nc * 1_000_000) // nd
