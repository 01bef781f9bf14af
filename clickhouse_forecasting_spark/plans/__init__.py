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


# --- single-partition-collapse detector -----------------------------------
#
# An unpartitioned Window / global sort-to-one plans an
# `Exchange SinglePartition` whose input is the FULL upstream frame — the
# one operator shape that cannot scale out.  It is legitimate only when the
# frame feeding it is bounded: beneath an Aggregate (partial aggregates ride
# the exchange as one row per group of a bounded grain), a Limit /
# TakeOrderedAndProject, or a literal-sized leaf (Range, LocalTableScan).
# single_partition_collapses() walks the physical-plan tree and returns the
# offending Exchange lines — empty means every global-order operation in the
# plan is either distributed (operators/ranking.py) or provably bounded.

_SPC_BARRIERS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
    "BroadcastExchange",  # broadcast sides are bounded by the bcast threshold
)

_SPC_BOUNDED_LEAVES = (
    "Range ",  # spark.range(...) — literal row count
    "LocalTableScan",
    "Scan OneRowRelation",
    "ReusedExchange",  # original exchange subtree is audited where it appears
    "ReusedSubquery",
)


class _PlanNode:
    __slots__ = ("text", "children")

    def __init__(self, text: str):
        self.text = text
        self.children: list["_PlanNode"] = []


def _parse_plan_tree(plan: str) -> list[_PlanNode]:
    """Parse Spark's indented treeString into nodes (depth = prefix//3).

    Executed AQE stages (TableCacheQueryStage etc.) embed `== Final Plan ==`
    / `== Initial Plan ==` section headers inline: the headers are
    structural noise (dropped), and the Initial-plan section is the
    pre-adaptive rendering of the SAME subtree — auditing it would
    double-count, so it is skipped and only the Final plan is walked."""
    roots: list[_PlanNode] = []
    stack: list[tuple[int, _PlanNode]] = []
    skip_deeper_than: int | None = None
    for raw in plan.splitlines():
        if not raw.strip() or raw.lstrip().startswith("=="):
            continue
        i = 0
        while raw[i : i + 3] in ("   ", ":  ", ":- ", "+- "):
            marker = raw[i : i + 3]
            i += 3
            if marker in (":- ", "+- "):
                break
        text = raw[i:]
        depth = i // 3
        if skip_deeper_than is not None:
            if depth >= skip_deeper_than:
                continue
            skip_deeper_than = None
        if text.startswith("=="):
            if "Initial Plan" in text:
                skip_deeper_than = depth
            continue
        node = _PlanNode(text)
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            stack[-1][1].children.append(node)
        else:
            roots.append(node)
        stack.append((depth, node))
    return roots


# Checkpointed frames read back as opaque `Scan ExistingRDD` leaves, so a
# 25-row category aggregate is indistinguishable from a checkpointed corpus.
# Queries that checkpoint a provably tiny frame (bounded by a category
# cross-product or a literal, never by fact rows) declare it by carrying a
# `__bounded_<why>` marker column into the checkpoint; the leaf line prints
# the frame's schema, so the marker is visible here AND greppable in source
# (each use must carry a justification in its name/comment).
BOUNDED_MARK_PREFIX = "__bounded_"


def _spc_unbounded(node: _PlanNode) -> bool:
    t = node.text
    if BOUNDED_MARK_PREFIX in t:
        # marker column visible in this node's attribute list — the frame
        # flowing through here is bounded by construction (leaf schemas,
        # mapInPandas output schemas, projects over marked frames)
        return False
    if any(b in t for b in _SPC_BARRIERS):
        return False
    if not node.children:
        return not any(b in t for b in _SPC_BOUNDED_LEAVES)
    return any(_spc_unbounded(c) for c in node.children)


def single_partition_collapses(df: DataFrame, run: bool = False) -> list[str]:
    """Exchange SinglePartition nodes fed by an unbounded frame — the
    global-sort anti-pattern census (must be empty for every registered
    query; enforced by tests/test_plans.py and the PLANS.md `1part` column).
    """
    plan = physical_plan(df, run=run)
    flagged: list[str] = []

    def walk(node: _PlanNode) -> None:
        if node.text.startswith("Exchange SinglePartition") and any(
            _spc_unbounded(c) for c in node.children
        ):
            flagged.append(node.text.split(", [plan_id")[0])
        for c in node.children:
            walk(c)

    for root in _parse_plan_tree(plan):
        walk(root)
    return flagged
