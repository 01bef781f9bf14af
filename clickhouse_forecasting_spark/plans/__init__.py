"""Physical-plan introspection helpers.

The engine's scale guarantees (pruned scans, pushed filters, broadcast dim
joins, no cartesian products, exchange reuse) are *plan* properties, not
result properties — these helpers make them assertable in tests
(tests/test_plans.py) and inspectable in notebooks via plan_summary().
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, run: bool = False) -> str:
    """The executed-plan string; with run=True, executes first so AQE's
    final plan (with whole-stage-codegen spans) is what's rendered."""
    if run:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — what actually hits storage."""
    return re.findall(r"ReadSchema: (\S+)", physical_plan(df))


def pushed_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PushedFilters: (\[[^\]]*\])", physical_plan(df))


def plan_summary(df: DataFrame, run: bool = False) -> dict[str, int]:
    """Operator census of the physical plan — the numbers to watch when
    reviewing an operator for 100 TB viability."""
    plan = physical_plan(df, run=run)
    return {
        "exchanges": plan.count("Exchange"),
        "reused_exchanges": plan.count("ReusedExchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffledhash_joins": plan.count("ShuffledHashJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "parquet_scans": plan.count("Scan parquet"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_evals": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }
