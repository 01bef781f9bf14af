"""Semantic invariants for the round-2 query additions (beyond the
DuckDB hash gate): budget conservation, path/session consistency,
curation-rate arithmetic, deterministic-IVF recall, forecast contracts.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_token_budget_is_conserved_and_proportional(spark, sf_dir, qs):
    rows = qs["corpus_token_budget"](spark, sf_dir).collect()
    assert sum(r.token_quota for r in rows) == 100_000  # exact conservation
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        exact = 100_000 * r.n_tokens / total
        # largest-remainder never deviates more than 1 from the real share
        assert abs(r.token_quota - exact) < 1.0, (r.lang, r.source)


def test_session_paths_consistent_with_sessionization(spark, sf_dir, qs):
    paths = qs["session_event_paths"](spark, sf_dir).collect()
    assert paths and all(r.n_sessions >= 1 for r in paths)
    # ranks are dense, ordered by (count desc, path)
    counts = [(r.rank, r.n_sessions) for r in sorted(paths, key=lambda r: r.rank)]
    assert [r for r, _ in counts] == list(range(1, len(counts) + 1))
    assert all(a[1] >= b[1] for a, b in zip(counts, counts[1:]))
    # total sessions across ALL paths equals the sessionization query's total
    all_paths_total = (
        qs["session_event_paths"](spark, sf_dir)
        .agg(F.sum("n_sessions"))
        .collect()
    )
    n_sessions_total = sum(
        r.n_sessions for r in qs["sessionization"](spark, sf_dir).collect()
    )
    # top-20 is a subset, so it can't exceed the true total
    assert all_paths_total[0][0] <= n_sessions_total


def test_dedup_rate_report_arithmetic(spark, sf_dir, qs):
    rows = qs["dedup_rate_by_source"](spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    kept_total = sum(r.n_docs - r.n_dropped for r in rows)
    shipped = qs["dedup_near_projection"](spark, sf_dir).count()
    assert kept_total == shipped  # the report reconciles with the artifact
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_docs
        assert r.keep_ratio_ppm == (r.n_docs - r.n_dropped) * 1_000_000 // r.n_docs


def test_ivf_det_results_are_true_cosines(spark, sf_dir, qs):
    approx = {r.vec_id: r.cosine for r in qs["similarity_ivf_det_topk"](spark, sf_dir).collect()}
    exact = {r.vec_id: r.cosine for r in qs["similarity_topk"](spark, sf_dir).collect()}
    assert approx
    # every returned cosine is the true cosine (probe only prunes candidates)
    for vid, cos in approx.items():
        if vid in exact:
            assert cos == pytest.approx(exact[vid], abs=1e-6)
    # the query's own bucket is probed, so vec_id 0 (cosine 1.0) is found
    assert approx.get(0) == pytest.approx(1.0, abs=1e-6)


def test_forecast_contract_audits_are_healthy(spark, sf_dir, qs):
    one = qs["forecast_contract_audit"](spark, sf_dir).collect()[0]
    assert one.n_bound_violations == 0 and one.n_null_cells == 0
    fut = qs["forecast_future_contract_audit"](spark, sf_dir).collect()[0]
    assert fut.n_rows == 7 and fut.n_bound_violations == 0
    assert (fut.max_date - fut.min_date).days == 6
    multi = qs["forecast_multi_contract_audit"](spark, sf_dir).collect()
    assert {(r["table"], r.metric) for r in multi} == {
        ("orders_daily", "order_count"),
        ("orders_daily", "total_revenue"),
        ("events_daily", "event_count"),
        ("events_daily", "total_value"),
    }
    assert all(r.n_bound_violations == 0 for r in multi)


def test_containment_pairs_bounds_and_superset_of_jaccard(spark, sf_dir, qs):
    cont = qs["dedup_containment_pairs"](spark, sf_dir).collect()
    assert cont, "fixture corpus is known to contain near-dup pairs"
    for r in cont:
        assert 0 <= r.cont_a_in_b_ppm <= 1_000_000
        assert 0 <= r.cont_b_in_a_ppm <= 1_000_000
        assert max(r.cont_a_in_b_ppm, r.cont_b_in_a_ppm) >= 600_000
        expect = "a_in_b" if r.cont_a_in_b_ppm >= r.cont_b_in_a_ppm else "b_in_a"
        assert r.contained == expect
    # J = |A∩B|/|A∪B| <= |A∩B|/min(|A|,|B|) = max containment, so every
    # Jaccard>=0.8 near-dup pair must also clear the 0.6 containment gate
    jac = qs["dedup_ngram_jaccard"](spark, sf_dir).collect()
    cont_keys = {(r.id_a, r.id_b) for r in cont}
    for r in jac:
        assert (r.id_a, r.id_b) in cont_keys, "containment missed a Jaccard pair"


def test_bigram_lm_quality_report_shape(spark, sf_dir, qs):
    rows = qs["bigram_lm_quality"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_docs > 0 and r.n_bigrams >= r.n_docs
        # bigram probabilities are <= 1, so every ppm score lands in [0, 1e6];
        # the corpus mean is a weighted mean of doc means (integer-div slop 1)
        assert 0 <= r.min_doc_ppm <= r.max_doc_ppm <= 1_000_000
        assert r.min_doc_ppm - 1 <= r.corpus_mean_ppm <= r.max_doc_ppm + 1


def test_boilerplate_prefix_report_shares(spark, sf_dir, qs):
    rows = qs["boilerplate_prefix_report"](spark, sf_dir).collect()
    assert rows and len({r.source for r in rows}) == len(rows)
    for r in rows:
        assert 1 <= r.modal_n <= r.n_docs
        assert r.n_prefixes <= r.n_docs
        assert 0 <= r.modal_share_ppm <= 1_000_000
        assert len(r.modal_prefix) <= 16


def test_cross_source_leakage_is_subset_of_near_dups(spark, sf_dir, qs):
    leak = qs["cross_source_leakage"](spark, sf_dir).collect()
    for r in leak:
        assert r.source_x < r.source_y  # unordered pair normalization
        assert r.n_pairs >= 1 and 0.8 <= r.max_jaccard <= 1.0
    # leaked pair count never exceeds the total near-dup pair count
    total_near = qs["dedup_ngram_jaccard"](spark, sf_dir).count()
    assert sum(r.n_pairs for r in leak) <= total_near


def test_epoch_shuffle_manifest_is_deterministic_partition(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = qs["epoch_shuffle_manifest"](spark, sf_dir).collect()
    assert [r.shard for r in rows] == sorted({r.shard for r in rows})
    assert all(0 <= r.shard < 8 for r in rows)
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    ids = docs.agg(F.sum("doc_id")).collect()[0][0]
    # the shards partition the corpus exactly: counts and id checksums add up
    assert sum(r.n_docs for r in rows) == n
    assert sum(r.id_checksum for r in rows) == ids
    # shares are exact integer ppm of the true total
    for r in rows:
        assert r.share_ppm == r.n_docs * 1_000_000 // n
    # second run returns the identical manifest (pure function of doc_id)
    again = qs["epoch_shuffle_manifest"](spark, sf_dir).collect()
    assert again == rows


def test_source_domain_similarity_matrix(spark, sf_dir, qs):
    rows = qs["source_domain_similarity"](spark, sf_dir).collect()
    srcs = {s for r in rows for s in (r.source_x, r.source_y)}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2  # full unordered pair matrix
    for r in rows:
        assert r.source_x < r.source_y
        assert r.dot >= 0  # count vectors are non-negative
        assert 0.0 <= r.cosine <= 1.0 + 1e-9


def test_corpus_novelty_decay_conserves_shingle_firsts(spark, sf_dir, qs):
    rows = qs["corpus_novelty_decay"](spark, sf_dir).collect()
    assert rows and all(1 <= r.decile <= 10 for r in rows)
    for r in rows:
        assert 0 <= r.novelty_ppm <= 1_000_000
        assert r.n_shingles >= r.n_docs  # every doc has >= 1 shingle
    # every distinct shingle is novel exactly once: summing novel counts
    # across all buckets equals the corpus-wide distinct shingle count
    from clickhouse_forecasting_spark.functions import dedup as DD
    from clickhouse_forecasting_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    distinct_sh = (
        DD.shingle_sets(docs, cache_key=sf_dir)
        .select(F.explode("sh_set").alias("sh"))
        .distinct()
        .count()
    )
    novel_total = sum(
        int(r.novelty_ppm * r.n_shingles) for r in rows
    )  # ppm floors, so only a bound check
    assert novel_total <= distinct_sh * 1_000_000


def test_curation_funnel_stages_partition_the_corpus(spark, sf_dir, qs):
    from clickhouse_forecasting_spark.sources import read_table

    rows = qs["curation_funnel_report"](spark, sf_dir).collect()
    total_docs = read_table(spark, sf_dir, "documents").count()
    # stage attribution is a partition: every doc lands in exactly one bucket
    assert sum(r.n_docs for r in rows) == total_docs
    for r in rows:
        assert r.drop_short + r.drop_near_dup + r.drop_low_lm + r.kept == r.n_docs
    # the near-dup stage can never claim more docs than there are verified
    # dup losers corpus-wide
    dup_losers = (
        qs["dedup_ngram_jaccard"](spark, sf_dir).select("id_b").distinct().count()
    )
    assert sum(r.drop_near_dup for r in rows) <= dup_losers
