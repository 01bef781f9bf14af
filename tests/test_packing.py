"""Semantic invariants for the sequence-packing, estimator-quality, and
eval-report queries (beyond the DuckDB hash gate): token conservation,
budget compliance, bin contiguity, estimator bounds, confusion-matrix
reconciliation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.operators import packing as PK
from clickhouse_forecasting_spark.sources import read_table

BUDGET = 256


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


@pytest.fixture(scope="module")
def tok_totals(spark, sf_dir):
    rows = (
        PK.token_lengths(read_table(spark, sf_dir, "documents"))
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("d"))
        .collect()
    )
    return {r.source: (r.t, r.d) for r in rows}


def test_pack_chunks_conserves_tokens_and_fills(spark, sf_dir, qs, tok_totals):
    rows = qs["corpus_pack_chunks"](spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert set(by_source) == set(tok_totals)
    for src, bins in by_source.items():
        bins.sort(key=lambda r: r.bin_id)
        # bins are contiguous from 0
        assert [b.bin_id for b in bins] == list(range(len(bins)))
        # every bin except the last is exactly full; token mass conserved
        assert all(b.bin_tokens == BUDGET for b in bins[:-1])
        assert 1 <= bins[-1].bin_tokens <= BUDGET
        assert sum(b.bin_tokens for b in bins) == tok_totals[src][0]
        # a bin has at most one straddler carried in, and bin 0 has none
        assert bins[0].n_carry == 0
        assert all(0 <= b.n_carry <= 1 for b in bins)
        assert all(b.n_docs >= 1 for b in bins)


def test_pack_firstfit_budget_and_completeness(spark, sf_dir, qs, tok_totals):
    rows = qs["corpus_pack_firstfit"](spark, sf_dir).collect()
    docs_per_source: dict[str, int] = {}
    fills: dict[tuple, list] = {}
    for r in rows:
        docs_per_source[r.source] = docs_per_source.get(r.source, 0) + 1
        fills.setdefault((r.source, r.bin_id), []).append(r.n_tokens)
    # every non-empty doc assigned exactly once
    assert docs_per_source == {s: d for s, (_, d) in tok_totals.items()}
    for (src, bin_id), toks in fills.items():
        # a bin over budget can only be a single oversize doc
        if sum(toks) > BUDGET:
            assert len(toks) == 1 and toks[0] > BUDGET, (src, bin_id)
    # bin ids are contiguous from 0 per source
    for src in docs_per_source:
        ids = sorted({b for (s, b) in fills if s == src})
        assert ids == list(range(len(ids))), src


def test_firstfit_never_beats_chunk_count_lower_bound(spark, sf_dir, qs, tok_totals):
    """ceil(total/budget) is the packing lower bound; first-fit (never
    splitting docs) uses at least as many bins as concat-chunk."""
    ff = qs["corpus_pack_firstfit"](spark, sf_dir).collect()
    n_bins_ff = {}
    for r in ff:
        n_bins_ff[r.source] = max(n_bins_ff.get(r.source, 0), r.bin_id + 1)
    for src, (total, _) in tok_totals.items():
        lower = -(-total // BUDGET)
        assert n_bins_ff[src] >= lower, src


def test_minhash_estimate_error_bounds(spark, sf_dir, qs):
    rows = qs["minhash_estimate_error"](spark, sf_dir).collect()
    assert rows  # LSH surfaces candidates on the fixture corpus
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.jaccard <= 1.0
        assert abs(abs(r.est_jaccard - r.jaccard) - r.abs_err) < 2e-6
    # the estimator must be informative: high-sim pairs estimate high
    high = [r for r in rows if r.jaccard >= 0.9]
    if high:
        assert sum(r.est_jaccard for r in high) / len(high) > 0.5


def test_embedding_standardize_outliers_shape(spark, sf_dir, qs):
    rows = qs["embedding_standardize_outliers"](spark, sf_dir).collect()
    n_vecs = read_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == 64
    for r in rows:
        assert r.sd_v >= 0.0
        # 2.5-sigma tails are small by construction
        assert 0 <= r.n_hi + r.n_lo < n_vecs * 0.2, r.dim


def test_lang_id_confusion_reconciles(spark, sf_dir, qs):
    rows = qs["lang_id_confusion"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert sum(r.n for r in rows) == docs.count()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + r.share_ppm
    # integer-division shares sum to <= 1e6 and within rounding slack
    for lang, ppm in per_lang.items():
        assert 1_000_000 - len(rows) <= ppm <= 1_000_000, lang


def test_incremental_rollup_matches_batch(spark, sf_dir, qs):
    """The merge-of-partials path must equal the batch rollup computed
    directly in Spark (the oracle checks vs DuckDB; this pins the
    within-engine equivalence on exact decimals)."""
    merged = {
        (r.date, r.event_count, r.total_value)
        for r in qs["incremental_rollup_equivalence"](spark, sf_dir).collect()
    }
    ev = read_table(spark, sf_dir, "events")
    batch = {
        (r.date, r.event_count, r.total_value)
        for r in ev.withColumn("date", F.to_date("ts"))
        .groupBy("date")
        .agg(
            F.count("*").cast("bigint").alias("event_count"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,10)")).cast("double"), 6
            ).alias("total_value"),
        )
        .collect()
    }
    assert merged == batch and merged


def test_bloom_semi_join_audit_laws(spark, sf_dir, qs):
    r = qs["bloom_semi_join_audit"](spark, sf_dir).collect()[0]
    # Bloom filters never produce false negatives
    assert r.n_false_neg == 0
    assert r.n_bloom_pass == r.n_exact + r.n_false_pos
    assert 0 < r.n_exact <= r.n_probed
    # the filter must actually filter (pass rate well under 100%)
    assert r.n_bloom_pass < r.n_probed


def test_holt_recurrence_replays_exactly(spark, sf_dir, qs):
    """Recompute the Holt recurrence driver-side from the daily series;
    the applyInPandas result must match bit-for-bit."""
    daily = sorted(
        (r.date, r.total_revenue)
        for r in qs["daily_sales_series"](spark, sf_dir).collect()
    )
    y = [v for _, v in daily]
    lvl, tr = y[0], y[1] - y[0]
    expect = {daily[0][0]: (lvl, tr, y[0])}
    for i in range(1, len(y)):
        fit = lvl + tr
        new_lvl = 0.2 * y[i] + (1 - 0.2) * (lvl + tr)
        tr = 0.1 * (new_lvl - lvl) + (1 - 0.1) * tr
        lvl = new_lvl
        expect[daily[i][0]] = (lvl, tr, fit)
    got = qs["holt_linear_daily"](spark, sf_dir).collect()
    assert len(got) == len(y)
    for r in got:
        e = expect[r.date]
        assert (r.level, r.trend, r.fitted) == e, r.date


def test_corpus_split_assignment_partitions_corpus(spark, sf_dir, qs):
    rows = qs["corpus_split_assignment"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    total = sum(by_split.values())
    # 96/2/2 target with hash noise on a small corpus
    assert by_split["train"] / total > 0.85


def test_hash_embedding_conserves_token_mass(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.functions import text as TX

    rows = qs["text_hash_embedding"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    counts = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", TX.token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert len(rows) == sum(1 for n in counts.values() if n > 0)
    for r in rows:
        fs = [r[f"f{i}"] for i in range(16)]
        assert all(v >= 0 for v in fs)
        assert sum(fs) == counts[r.doc_id]  # every token lands in one dim


def test_stream_lateness_profile_is_ordered(spark, sf_dir, qs):
    r = qs["stream_lateness_profile"](spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events")
    assert r.n_events == ev.count()
    assert 0 <= r.p50_late_us <= r.p90_late_us <= r.p99_late_us <= r.max_late_us
    assert 0 <= r.over_60s_ppm <= 1_000_000


def test_chunk_overlap_manifest_covers_every_token(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["corpus_chunk_overlap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # windows tile [0, n) with stride 64: every token lands in >= 1
        # and <= 2 windows, so expansion lies in [1, 2] exactly
        assert r.n_tokens <= r.window_tokens <= 2 * r.n_tokens
        assert 1_000_000 <= r.expansion_ppm <= 2_000_000
        assert r.n_windows >= r.n_docs
        assert 0 <= r.full_share_ppm <= 1_000_000
