"""Semantic invariants for the round-1 batch-2 analytics queries
(grouping sets, argmax-per-group, dow seasonality, bigrams, embedding
centroids, length histogram, repetition). Cross-engine value equality is
covered by the DuckDB oracle gate; these tests pin the *semantics* that a
hash can't explain when it breaks.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_grouping_sets_two_grains_consistent(spark, sf_dir, qs):
    rows = qs["grouping_sets_revenue"](spark, sf_dir).collect()
    # exactly two grouping ids: (n_name) -> year grouped out (gid=1),
    # (order_year) -> nation grouped out (gid=2)
    gids = {r.gid for r in rows}
    assert gids == {1, 2}
    by_nation = [r for r in rows if r.gid == 1]
    by_year = [r for r in rows if r.gid == 2]
    assert all(r.n_name is not None and r.order_year is None for r in by_nation)
    assert all(r.n_name is None and r.order_year is not None for r in by_year)
    # both grains partition the same fact rows -> identical totals
    assert sum(r.n_orders for r in by_nation) == sum(r.n_orders for r in by_year)
    assert sum(r.revenue for r in by_nation) == pytest.approx(
        sum(r.revenue for r in by_year), rel=1e-9
    )


def test_argmax_order_is_the_customer_max(spark, sf_dir, qs):
    res = qs["argmax_order_per_customer"](spark, sf_dir)
    rows = res.collect()
    assert len(rows) == 25
    assert [r.rank for r in rows] == list(range(1, 26))
    from clickhouse_forecasting_spark.sources import read_table

    o = read_table(spark, sf_dir, "orders")
    checked = (
        res.join(o, res.best_orderkey == o.o_orderkey)
        .select("best_price", "o_totalprice", res.o_custkey, o.o_custkey.alias("ok"))
        .collect()
    )
    assert len(checked) == 25
    for r in checked:
        assert r.o_custkey == r.ok  # the argmax key belongs to that customer
        assert r.best_price == pytest.approx(float(r.o_totalprice))


def test_dow_seasonality_partitions_days(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = qs["dow_seasonality"](spark, sf_dir).collect()
    assert {r.isodow for r in rows} <= set(range(1, 8))
    n_dates = (
        read_table(spark, sf_dir, "orders").select("o_orderdate").distinct().count()
    )
    assert sum(r.n_days for r in rows) == n_dates
    for r in rows:
        assert r.avg_daily_revenue == pytest.approx(r.total_revenue / r.n_days, abs=1e-4)


def test_bigram_counts_monotone(spark, sf_dir, qs):
    rows = qs["text_bigram_top"](spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(" " in r.bigram for r in rows)


def test_embedding_centroid_shape_and_range(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = qs["embedding_centroid_by_label"](spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings")
    n_labels = emb.select("label").distinct().count()
    assert len(rows) == n_labels * 64
    per_label = emb.groupBy("label").count().collect()
    counts = {r.label: r["count"] for r in per_label}
    for r in rows:
        assert 1 <= r.pos <= 64
        assert r.n == counts[r.label]  # every dim of every vector contributed


def test_doc_length_histogram_covers_corpus(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = qs["doc_length_histogram"](spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.bucket_lo <= r.min_chars <= r.max_chars < r.bucket_lo + 50


def test_variant_extraction_total_and_bounds(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = qs["variant_props_analytics"](spark, sf_dir).collect()
    n_events = read_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        assert r.n_with_k <= r.n
        if r.n_with_k:
            assert r.min_k <= r.avg_k <= r.max_k


def test_repetition_bounded_and_consistent(spark, sf_dir, qs):
    rows = qs["text_repetition"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r.repetition <= 1.0
        assert r.n_distinct <= r.n_tokens
        assert r.repetition == pytest.approx(
            1.0 - r.n_distinct / max(r.n_tokens, 1), abs=1e-6
        )


def test_decontamination_flags_benchmark_overlap(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = qs["decontaminate_corpus"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    n_corpus = docs.filter(F.col("doc_id") % 97 != 0).count()
    assert sum(r.n_docs for r in rows) == n_corpus
    for r in rows:
        assert r.n_kept == r.n_docs - r.n_contaminated
        assert 0 <= r.n_contaminated <= r.n_docs
    # the synthetic vocabulary guarantees SOME 4-gram overlap exists
    assert sum(r.n_contaminated for r in rows) > 0


def test_mix_sampling_deterministic_and_rate_shaped(spark, sf_dir, qs):
    a = {(r.source): (r.rate, r.n_docs, r.n_selected) for r in qs["corpus_mix_sample"](spark, sf_dir).collect()}
    b = {(r.source): (r.rate, r.n_docs, r.n_selected) for r in qs["corpus_mix_sample"](spark, sf_dir).collect()}
    assert a == b  # hash gate: no RNG, identical selection every run
    for src, (rate, n, sel) in a.items():
        if rate == 1.0:
            assert sel == n  # full-weight sources keep everything
        else:
            assert 0 <= sel <= n
    # aggregate 0.4-rate selection lands near 40% (hash uniformity)
    lo = [v for v in a.values() if v[0] == 0.4]
    tot, seltot = sum(v[1] for v in lo), sum(v[2] for v in lo)
    assert 0.25 <= seltot / tot <= 0.55


def test_range_frame_includes_trailing_hour_only(spark):
    import datetime as dt

    from pyspark.sql import Window

    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 10, 0, 0), 1.0),
        (2, "a", dt.datetime(2024, 1, 1, 10, 30, 0), 2.0),
        (3, "a", dt.datetime(2024, 1, 1, 10, 59, 0), 4.0),
        (4, "a", dt.datetime(2024, 1, 1, 11, 1, 0), 8.0),
        (5, "b", dt.datetime(2024, 1, 1, 10, 30, 0), 100.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp, value double")
    w = Window.partitionBy("event_type").orderBy(F.unix_micros("ts")).rangeBetween(-3_600_000_000, 0)
    got = {
        r.event_id: (r.n, r.s)
        for r in df.select(
            "event_id",
            F.count("*").over(w).alias("n"),
            F.sum("value").over(w).alias("s"),
        ).collect()
    }
    # event 4 (11:01) sees 10:30, 10:59 and itself — 10:00 aged out
    assert got == {1: (1, 1.0), 2: (2, 3.0), 3: (3, 7.0), 4: (3, 14.0), 5: (1, 100.0)}


def test_moments_match_native_aggregates(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = {r.event_type: r for r in qs["stats_moments"](spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").withColumn(
        "k", F.try_variant_get(F.parse_json("props"), "$.k", "int")
    )
    native = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.stddev_samp("value").alias("sd"),
            F.corr("value", F.col("k").cast("double")).alias("c"),
        )
        .collect()
    }
    for et, r in rows.items():
        assert r.stddev_value == pytest.approx(native[et].sd, abs=1e-5)
        assert r.corr_value_k == pytest.approx(native[et].c, abs=1e-5)


def test_scd2_intervals_tile_each_user_timeline(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = qs["scd2_user_state_intervals"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert len(by_user) == n_users
    for uid, ivals in by_user.items():
        ivals.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per user, and it is the last
        assert [r.is_current for r in ivals].count(True) == 1
        assert ivals[-1].is_current and ivals[-1].valid_to is None
        for a, b in zip(ivals, ivals[1:]):
            assert a.valid_to == b.valid_from  # intervals tile, no gaps
            assert a.state != b.state  # consecutive duplicates compressed


def test_seasonal_decomposition_reconstructs_series(spark, sf_dir, qs):
    rows = qs["seasonal_decompose_daily"](spark, sf_dir).collect()
    assert rows
    # additive identity: y == trend + seasonal + residual (to rounding)
    for r in rows:
        assert abs(r.y - (r.trend + r.seasonal + r.residual)) < 1e-4
    # seasonal components recenter to ~zero across the 7 weekdays
    seasonal_by_day = {}
    for r in rows:
        seasonal_by_day[r.day.isoweekday()] = r.seasonal
    assert len(seasonal_by_day) == 7
    assert abs(sum(seasonal_by_day.values())) < 1e-3
