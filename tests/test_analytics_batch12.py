"""Semantic invariants for the batch-12 two-sample tests (KS statistic,
Mann-Whitney U) and the LATERAL top-k query. Cross-engine value equality
is covered by the DuckDB oracle gate; these pin the math against scipy
(when importable) or plain-Python reimplementations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


@pytest.fixture(scope="module")
def two_samples(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .join(read_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        )
        .collect()
    )
    s1 = sorted(r.v for r in rows if r.c_mktsegment == "BUILDING")
    s2 = sorted(r.v for r in rows if r.c_mktsegment == "MACHINERY")
    return s1, s2


def test_ks_matches_scipy(spark, sf_dir, qs, two_samples):
    row = qs["ks_test_segments"](spark, sf_dir).collect()[0]
    s1, s2 = two_samples
    assert (row.n1, row.n2) == (len(s1), len(s2))
    d = row.d_scaled / (row.n1 * row.n2)
    assert row.d_ppm == (row.d_scaled * 1_000_000) // (row.n1 * row.n2)
    try:
        from scipy.stats import ks_2samp

        ref = ks_2samp(s1, s2).statistic
    except ImportError:
        # exact python twin: max |F1 - F2| over the merged support
        import bisect

        ref = max(
            abs(
                bisect.bisect_right(s1, x) / len(s1)
                - bisect.bisect_right(s2, x) / len(s2)
            )
            for x in set(s1) | set(s2)
        )
    assert d == pytest.approx(ref, abs=1e-12)


def test_mannwhitney_matches_scipy(spark, sf_dir, qs, two_samples):
    row = qs["mannwhitney_u_segments"](spark, sf_dir).collect()[0]
    s1, s2 = two_samples
    assert (row.n1, row.n2) == (len(s1), len(s2))
    u1 = row.u1_2 / 2
    try:
        from scipy.stats import mannwhitneyu

        ref = mannwhitneyu(s1, s2, alternative="two-sided", method="asymptotic")
        assert u1 == pytest.approx(ref.statistic, abs=1e-9)
    except ImportError:
        # rank-sum twin with averaged tie ranks
        merged = sorted((v, i) for i, s in enumerate((s1, s2)) for v in s)
        ranks: dict[float, float] = {}
        j = 0
        while j < len(merged):
            k = j
            while k < len(merged) and merged[k][0] == merged[j][0]:
                k += 1
            avg = (j + 1 + k) / 2
            ranks[merged[j][0]] = avg
            j = k
        r1 = sum(ranks[v] for v in s1)
        assert u1 == pytest.approx(r1 - len(s1) * (len(s1) + 1) / 2, abs=1e-9)
    # tie term is exact: sum t^3 - t over tie groups of the merged sample
    from collections import Counter

    cnt = Counter(s1) + Counter(s2)
    assert row.tie3 == sum(c**3 - c for c in cnt.values())


def test_lateral_top2_per_nation(spark, sf_dir, qs):
    rows = qs["lateral_top_balances"](spark, sf_dir).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(read_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name", "c_name",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
        )
        .collect()
    )
    ref: dict[str, list] = {}
    for r in cust:
        ref.setdefault(r.n_name, []).append((-r.bal, r.c_name))
    for n, got in by_nation.items():
        expect = sorted(ref[n])[:2]
        assert sorted((-r.bal, r.c_name) for r in got) == expect


def test_lateral_sql_text_parity(spark, sf_dir):
    """ANSI-LATERAL front-end parity: the IDENTICAL SQL string runs
    through spark.sql() and DuckDB and must produce value-identical
    results. This pins what the registry entry used to pin before it
    was rewritten onto grouped_top_k (Catalyst decorrelates the LATERAL
    LIMIT subquery into an enum-partitioned window — ≤|nation| tasks,
    the bounded_key_fanins anti-pattern, so the Catalyst-shaped plan is
    a parity TEST, not the executed query)."""
    import duckdb

    from clickhouse_forecasting_spark.queries import _LATERAL_SQL
    from clickhouse_forecasting_spark.sources import read_table

    for t in ["nation", "customer"]:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    got = sorted(
        tuple(r) for r in spark.sql(_LATERAL_SQL).collect()
    )
    con = duckdb.connect()
    for t in ["nation", "customer"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    ref = sorted(tuple(r) for r in con.execute(_LATERAL_SQL).fetchall())
    assert got == ref
    # and the SAME semantics from the scale-safe registry entry
    import __spark_entry__ as e

    reg = sorted(
        tuple(r) for r in e.queries()["lateral_top_balances"](spark, sf_dir).collect()
    )
    assert reg == ref
