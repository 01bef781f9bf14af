"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <float>}

Each query is forced with a full collect() (the driver-side hash gate does
the same), timed individually after a session warm-up query so JVM spin-up
is not attributed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: every pillar of the engine — relational (TPC-H shapes),
# window/sessionization, as-of join, streaming twin, text analysis, dedup
# (exact / minhash-LSH / simhash / jaccard), similarity search, forecast.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_top_orders",
    "tpch_q4_priority_semi_join",
    "tpch_q5_nation_volume",
    "tpch_q6_revenue_delta",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_by_linestatus",
    "tpch_q13_order_count_distribution",
    "tpch_q16_supplier_count",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_orders",
    "tpch_q22_dormant_customers",
    "window_top_customers",
    "window_moving_average",
    "gap_fill_daily_revenue",
    "timeseries_multigrain",
    "rollup_nation_year",
    "sessionization",
    "asof_join",
    "range_join_events",
    "streaming_daily_rollup",
    "daily_shipping_series",
    "text_stats",
    "text_lang_id",
    "text_quality",
    "dedup_exact_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "embedding_near_dup",
    "similarity_topk",
    "similarity_pairwise_topk",
    "similarity_multiprobe_topk",
    "grouping_sets_revenue",
    "text_bigram_top",
    "embedding_centroid_by_label",
    "sketch_rollup_daily_users",
    "sketch_weekly_retention",
    "variant_props_analytics",
    "user_growth_accounting",
    "dq_orders_expectations",
    "per_group_sample",
    "stats_moments",
    "window_range_1h_rolling",
    "nation_top_customers_listagg",
    "allocation_proration",
    "cohort_retention_weekly",
    "ewma_daily_revenue",
    "revenue_streaks",
    "bm25_keyword_search",
    "token_entropy",
    "dow_hour_heatmap",
    "mad_robust_stats",
    "forecast_daily_sales",
    "forecast_multi_table",
    "market_basket_pairs",
    "regression_trend_by_nation",
    "cusum_breakpoints",
    "event_type_trigrams",
    "fifo_attribution_match",
    "gini_revenue_by_nation",
    "acf_daily_revenue",
    "ks_test_segments",
    "phrase_search_positional",
    "peak_open_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entrymod
    from clickhouse_forecasting_spark.session import build_session

    spark = build_session(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entrymod.queries()

    # warm-up: JVM + parquet footer reads, not attributed to any query
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({len(rows)} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
