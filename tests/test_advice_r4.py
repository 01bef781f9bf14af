"""Pins for the round-3 ADVICE fixes, on CRAFTED fixtures the sf
tables cannot provide (negative rounding inputs; a retrieval query
with zero same-label neighbors). Each test runs the real registry
query against a tmp-path parquet layout so the exact shipped plan —
not a re-derivation — is what gets exercised.
"""

from __future__ import annotations

import datetime
import decimal

import pandas as pd
import pytest

import __spark_entry__ as entry


def _write_events(tmp_path, values, event_ids):
    pdf = pd.DataFrame(
        {
            "event_id": pd.array(event_ids, dtype="int64"),
            "ts": [datetime.datetime(2024, 1, 1 + i % 28) for i in range(len(values))],
            "user_id": pd.array([i % 7 for i in range(len(values))], dtype="int64"),
            "event_type": ["click"] * len(values),
            "value": pd.array(values, dtype="float64"),
            "props": ["{}"] * len(values),
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _py_round_tenths(u_micros: int, mode: str) -> int:
    """Reference rounding of u (integer micros) at the tenths grid,
    via exact decimal arithmetic — the ground truth the Spark formula
    must match for ANY sign."""
    d = decimal.Decimal(u_micros) / decimal.Decimal(100000)
    rounding = (
        decimal.ROUND_HALF_UP if mode == "away" else decimal.ROUND_HALF_EVEN
    )
    return int(d.quantize(decimal.Decimal(1), rounding=rounding))


def test_rounding_semantics_negative_and_tie_branches(spark, tmp_path):
    # values chosen so that after the query's event_id-parity sign flip
    # we cover: negative non-tie (both directions), negative exact tie
    # (odd and even floor), positive ties, and plain positives.
    # event_id even => sign -1 inside the query.
    values = [0.12, 0.12, 0.15, 0.15, 0.25, 0.25, 0.17, 0.17, 0.05, 0.05]
    event_ids = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
    sf = _write_events(tmp_path, values, event_ids)
    q = entry.queries()["rounding_semantics_report"]
    rows = q(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]

    signed_u = [
        int(round(v * 1_000_000)) * (-1 if eid % 2 == 0 else 1)
        for v, eid in zip(values, event_ids)
    ]
    exp_away = sum(_py_round_tenths(u, "away") for u in signed_u)
    exp_even = sum(_py_round_tenths(u, "even") for u in signed_u)
    exp_floor = sum(u // 100000 for u in signed_u)  # python // is floor
    exp_ties = sum(1 for u in signed_u if u % 100000 == 50000)

    assert r.sum_round_half_away == exp_away
    assert r.sum_round_bankers == exp_even
    assert r.sum_floor == exp_floor
    assert r.n_exact_ties == exp_ties
    # sanity: the crafted set must actually contain negative ties,
    # otherwise this test isn't exercising the fixed branch
    assert any(u < 0 and u % 100000 == 50000 for u in signed_u)
    assert any(u < 0 and u % 100000 != 50000 for u in signed_u)


def test_rounding_duckdb_twin_matches_on_negatives(spark, tmp_path):
    duckdb = pytest.importorskip("duckdb")
    values = [0.15, 0.25, 0.35, 0.45, 0.12, 0.18, 0.05, 0.95]
    event_ids = list(range(len(values)))
    sf = _write_events(tmp_path, values, event_ids)
    q = entry.queries()["rounding_semantics_report"]
    spark_row = q(spark, sf).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    sql = entry.oracle_sql()["rounding_semantics_report"]
    cols = [d[0] for d in con.execute(sql).description]
    oracle = dict(zip(cols, con.execute(sql).fetchall()[0]))
    for c in (
        "sum_round_half_away",
        "sum_round_bankers",
        "sum_floor",
        "n_exact_ties",
        "n_divergent",
    ):
        assert getattr(spark_row, c) == oracle[c], c


def test_retrieval_metrics_zero_relevant_guard(spark, tmp_path):
    # 25 vectors; vec_id 0 gets a label nobody else has -> as a query
    # it has n_relevant = 0 and must report rr_micro=recall10_ppm=0
    # (not NULL / not a vanished row).
    import numpy as np

    rng = np.random.RandomState(7)
    n = 25
    labels = [99] + [i % 3 for i in range(1, n)]
    pdf = pd.DataFrame(
        {
            "vec_id": pd.array(range(n), dtype="int64"),
            "embedding": [
                rng.rand(8).astype("float32").tolist() for _ in range(n)
            ],
            "label": pd.array(labels, dtype="int32"),
        }
    )
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"))
    q = entry.queries()["retrieval_metrics_report"]
    rows = {r.q_id: r for r in q(spark, str(tmp_path)).collect()}
    assert 0 in rows, "zero-relevant query row must not vanish"
    r0 = rows[0]
    assert r0.n_relevant == 0
    assert r0.rr_micro == 0
    assert r0.recall10_ppm == 0
    assert r0.ndcg_ppm == 0
    # a normal query still reports non-degenerate metrics
    assert any(v.n_relevant > 0 and v.rr_micro > 0 for v in rows.values())


def test_topk_by_aggregation_matches_window_formulation(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhouse_forecasting_spark.sources import read_table

    got = entry.queries()["topk_by_aggregation"](spark, sf_dir).collect()
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.round(F.col("c_acctbal") * 100).cast("bigint").desc(),
        F.col("c_custkey"),
    )
    exp = (
        cust.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("rnk").cast("bigint"),
            F.col("c_custkey").cast("bigint").alias("custkey"),
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        )
        .orderBy("nationkey", "rnk")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_semdedup_cluster_bound_fails_loudly(spark, tmp_path):
    """A degenerate corpus (all vectors identical -> every vector ties
    to the lowest centroid id) must trip the in-plan cluster-size
    bound with a clear error, not silently attempt a quadratic
    pairwise join."""
    import numpy as np

    n = 1100  # > _SEMDEDUP_MAX_CLUSTER once they all collapse to cluster 0
    vec = np.ones(8, dtype="float32").tolist()
    pdf = pd.DataFrame(
        {
            "vec_id": pd.array(range(n), dtype="int64"),
            "embedding": [vec] * n,
            "label": pd.array([0] * n, dtype="int32"),
        }
    )
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"))
    q = entry.queries()["semdedup_clusters"]
    with pytest.raises(Exception, match="semdedup cluster exceeds"):
        q(spark, str(tmp_path)).collect()


def test_semdedup_k_scales_with_corpus(spark):
    # the k(n) rule itself: 16 floor, then n/64
    rows_01 = entry.queries()["semdedup_clusters"](
        spark, "/root/testdata/sf0.01"
    ).count()
    rows_1 = entry.queries()["semdedup_clusters"](
        spark, "/root/testdata/sf0.1"
    ).count()
    assert rows_01 == 16  # 500 vectors -> floor k
    assert rows_1 == 31  # 2000 vectors -> 2000 // 64


def test_driver_edge_collect_guard(spark, sf_dir):
    """The bounded-collect guard behind the nation-graph queries must
    (a) pass through small edge lists unchanged and (b) refuse an
    unbounded one loudly, transferring at most bound+1 rows."""
    from clickhouse_forecasting_spark import queries as Q

    small = spark.range(100).selectExpr("id AS a", "id + 1 AS b")
    assert len(Q._collect_bounded_edges(small, "t")) == 100
    big = spark.range(Q._MAX_DRIVER_EDGES + 500).selectExpr(
        "id AS a", "id + 1 AS b"
    )
    with pytest.raises(ValueError, match="exceeds"):
        Q._collect_bounded_edges(big, "t")
    # the graph queries still run green through the guard
    assert entry.queries()["trade_graph_triangles"](spark, sf_dir).count() >= 0
    assert entry.queries()["khop_nation_reachability"](spark, sf_dir).count() > 0


def test_interval_length_sum_union_semantics(spark, tmp_path):
    """Three crafted cases: disjoint intervals add, nested intervals
    count once, chained overlaps merge — the union-not-sum contract."""
    import datetime

    base = datetime.datetime(2024, 1, 1)

    def ev(i, typ, offset_sec, dur):
        return (i, base + datetime.timedelta(seconds=offset_sec), 1, typ,
                float(dur), "{}")

    rows = [
        # disjoint: [0,10) + [20,30) -> 20
        ev(1, "disjoint", 0, 10), ev(2, "disjoint", 20, 10),
        # nested: [0,100) contains [10,20) -> 100
        ev(3, "nested", 0, 100), ev(4, "nested", 10, 10),
        # chain: [0,10) [5,15) [12,22) -> 22
        ev(5, "chain", 0, 10), ev(6, "chain", 5, 10), ev(7, "chain", 12, 10),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: (r.n_intervals, r.union_len_sec)
        for r in entry.queries()["interval_length_sum"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"disjoint": (2, 20), "nested": (2, 100), "chain": (3, 22)}


def test_schema_evolution_census_values(spark, sf_dir):
    import duckdb

    row = entry.queries()["schema_evolution_census"](spark, sf_dir).collect()[0]
    con = duckdb.connect()
    n, evens, sum_cents = con.execute(
        f"""SELECT COUNT(*),
            SUM(CASE WHEN o_orderkey %2=0 THEN 1 ELSE 0 END),
            SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()[0]
    assert row.n_rows == n            # no rows lost across generations
    assert row.n_cols_merged == 3     # merged schema is the union
    assert row.n_null_priority == evens  # gen-1 rows NULL, not dropped
    assert row.sum_cents == sum_cents    # gen-2 values intact


def test_query_metrics_reports_scan_and_shuffle(spark, sf_dir):
    """O-family extension: executed-plan metrics must expose scan
    selectivity and shuffle volume — and visibly REWARD projection
    pruning (narrow scan reads fewer bytes than SELECT *)."""
    from pyspark.sql import functions as F

    from clickhouse_forecasting_spark.sources import read_table
    from clickhouse_forecasting_spark.telemetry import query_metrics

    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    n_groups = len(agg.collect())  # execute THIS frame so metrics populate
    m = query_metrics(agg)
    assert m["rows_scanned"] == li.count()
    assert m["files_read"] >= 1
    assert m["bytes_scanned"] > 0
    assert m["shuffle_records"] >= n_groups  # partials per mapper
    assert m["shuffle_bytes_written"] > 0
    # map-side combine: shuffle carries partial aggregates, never the
    # scan grain
    assert m["shuffle_records"] < li.count() / 10
    assert any(n["node"] == "HashAggregateExec" for n in m["nodes"])


def test_gzip_is_not_splittable_but_parquet_text_is(spark, sf_dir, tmp_path):
    """The scale caveat behind gzip_text_ingest_census, pinned: with a
    tiny maxPartitionBytes the UNCOMPRESSED text splits into many scan
    partitions, while the SAME data in 2 gzip files stays exactly 2
    tasks — one per file, no matter the split size."""
    from pyspark.sql import functions as F

    from clickhouse_forecasting_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    lines = docs.select(F.col("text").alias("value")).repartition(2)
    plain, gz = str(tmp_path / "plain"), str(tmp_path / "gz")
    lines.write.text(plain)
    lines.write.option("compression", "gzip").text(gz)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        n_plain = spark.read.text(plain).rdd.getNumPartitions()
        n_gz = spark.read.text(gz).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert n_plain > 2, f"uncompressed text should split, got {n_plain}"
    assert n_gz == 2, f"gzip must be one task per file, got {n_gz}"
    # and the bytes are identical either way
    assert (
        spark.read.text(gz).count() == spark.read.text(plain).count()
    )
