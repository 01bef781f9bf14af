"""Census→runtime loop for single-partition exchanges (r7 VERDICT #2).

PLANS.md proves statically that every registered query plans with zero
UNBOUNDED single-partition collapses — but the `WindowExec: No Partition
Defined` warnings at bench time are attributed to bounded classes by
READING the plan. These tests measure instead: execute a bench subset,
walk the final AQE plan, and assert every SinglePartition shuffle moved
no more rows than any census-bounded class can produce
(telemetry.RUNTIME_SINGLEPART_CAP). A misclassified frame fails here
with the query name and the observed record count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_forecasting_spark import queries as Q
from clickhouse_forecasting_spark.telemetry import (
    RUNTIME_SINGLEPART_CAP,
    assert_runtime_single_partitions_bounded,
    runtime_single_partition_audit,
)

# Bench-subset queries whose plans legitimately carry global (unpartitioned)
# windows over census-bounded frames — the population that emits the
# WindowExec warnings the static census classifies as bounded.
GLOBAL_WINDOW_QUERIES = [
    "quantiles_exact_weighted",
    "allocation_proration",
    "corpus_pack_chunks",
    "pareto_revenue_concentration",
    "window_top_customers",
    "nation_top_customers_listagg",
    "lateral_top_balances",
    "gini_revenue_by_nation",
    "ks_test_segments",
    "cohort_retention_weekly",
]


def test_bench_subset_runtime_single_partitions_bounded(spark, sf_dir):
    """Every runtime SinglePartition exchange across the subset maps to a
    census-bounded class: its executed record count is under the cap.
    Also proves the audit is not vacuous — at least one such exchange is
    actually observed across the subset."""
    observed = 0
    for name in GLOBAL_WINDOW_QUERIES:
        df = Q.SPARK_QUERIES[name](spark, sf_dir)
        df.collect()
        rows = assert_runtime_single_partitions_bounded(df, query=name)
        observed += len(rows)
    assert observed > 0, (
        "audit saw no SinglePartition exchanges at all — subset or "
        "walker is broken (the grouped primitives' offset windows and "
        "scalar attachments must produce some)"
    )


def test_runtime_audit_negative_control(spark):
    """A genuinely data-proportional global window (the anti-pattern the
    census forbids) must fail the runtime audit once its frame exceeds
    the bounded-class cap."""
    big = spark.range(RUNTIME_SINGLEPART_CAP + 1).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    big.collect()
    audit = runtime_single_partition_audit(big, query="negative_control")
    assert any(not r["ok"] for r in audit)
    with pytest.raises(AssertionError, match="negative_control"):
        assert_runtime_single_partitions_bounded(big, query="negative_control")


def test_runtime_audit_attributes_records(spark):
    """The audit reports the exact record count a SinglePartition shuffle
    moved — the attribution the bench warnings lacked."""
    small = spark.range(777).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    small.collect()
    audit = runtime_single_partition_audit(small, query="attr_check")
    assert [r["records"] for r in audit] == [777]
    assert audit[0]["ok"] and audit[0]["query"] == "attr_check"


def test_runtime_plan_audit_matches_both_reads(spark, sf_dir):
    """r11: the fused one-walk audit returns exactly what the two
    separate walks return — singlepart rows identical to
    runtime_single_partition_audit, volume identical to query_metrics
    minus the per-node detail — on a real scan+shuffle query."""
    from clickhouse_forecasting_spark.telemetry import (
        query_metrics,
        runtime_plan_audit,
    )

    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .count()
    )
    df.collect()
    sp, vol = runtime_plan_audit(df, query="fused_check")
    assert sp == runtime_single_partition_audit(df, query="fused_check")
    qm = query_metrics(df)
    qm.pop("nodes")
    assert vol == qm
    assert vol["bytes_scanned"] > 0 and vol["rows_scanned"] > 0
    assert vol["shuffle_records"] > 0  # the groupBy exchange
