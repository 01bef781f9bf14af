"""Distributed total-order primitives: global row_number / ntile / run-length
without the single-partition WindowExec collapse.

``Window.orderBy(...)`` with no ``partitionBy`` plans an
``Exchange SinglePartition`` — every row of the input moves to ONE task, the
first thing that dies at 100 TB.  These helpers express the same total-order
semantics as:

    repartitionByRange(order keys)            # ranged shuffle, N-way parallel
      -> sortWithinPartitions(order keys)     # local sort, no merge step
      -> localCheckpoint                      # pin partition layout + ids
      -> per-partition local index            # monotonically_increasing_id
      -> tiny per-partition count frame       # N rows, N = shuffle partitions
      -> broadcast cumulative offsets         # rn = local index + offset

The ONLY unpartitioned window left is over the per-partition count frame,
whose size is bounded by ``spark.sql.shuffle.partitions`` (config, not data).

Why the localCheckpoint: the offsets subplan and the main subplan must see
the SAME range boundaries and partition ids.  RangePartitioner samples its
boundaries at run time, and AQE may coalesce the two shuffle reads
differently — so deriving both branches from one plan tree is not a
correctness guarantee.  Materializing the (projected — callers should select
only needed columns first) ranged frame freezes both, and the expensive
ranged sort is paid exactly once even though two jobs read it.  This is the
same materialize-the-sorted-run cost any external distributed sort pays.

Semantics provenance: these back the rank/ntile surfaces ClickHouse exposes
as ``row_number() OVER (ORDER BY ...)`` / ``ntile`` — used by the registry's
curriculum/quantile/drift queries (the reference's forecast_script.py has no
ranking; this is part of the LLM-data-pipeline extension surface).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rk_pid"
_LRN = "__rk_lrn"
_OFF = "__rk_off"
_CNT = "__rk_cnt"

# monotonically_increasing_id() = (partition_id << 33) | local_row_index
_MID_SHIFT = 33
_MID_MASK = (1 << _MID_SHIFT) - 1

# Default dispatch cap for the plain-window fast path: with |domain|
# group-tasks each sorting at most this many rows, the worst single task
# holds ~4M rows (a few hundred MB of sort) — executor-safe on any
# reasonable config, while the grouped machinery's constant overhead
# (ranged shuffle + eager localCheckpoint + broadcast rebase, measured
# median ~4x at 1-8M rows — NOTES_r7.md §7) never amortizes below it.
FASTPATH_MAX_ROWS = 4_000_000

# Upper bound on live dispatch probe persists (one per distinct plan
# semanticHash): enough that every dispatch-enabled query in a bench/suite
# run keeps its hit, small enough that a long-lived session stays bounded.
DISPATCH_CACHE_MAX = 64


def _order_cols(order_by: Sequence) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def _ordered_cols_with_asc(
    order_by: Sequence, ascending: Sequence[bool] | None
) -> list[Column]:
    """Order columns with optional per-key direction flags (the
    global_rank convention, extended to the other global primitives so
    dispatch call sites can stay plain-name + flags): with ``ascending``
    every entry must be a plain column name; without it, entries pass
    through ``_order_cols`` untouched (str -> asc, Column -> as built)."""
    if ascending is None:
        return _order_cols(order_by)
    keys = list(order_by)
    if not all(isinstance(k, str) for k in keys):
        raise ValueError(
            "ascending requires plain column names in order_by"
        )
    if len(list(ascending)) != len(keys):
        raise ValueError("ascending must match order_by length")
    return [
        F.col(k) if a else F.col(k).desc() for k, a in zip(keys, ascending)
    ]


def _first_str_key(order_by: Sequence) -> str | None:
    """First plain-string order key — the rowcap guard's wrap target for
    the global fast paths (the guard must replace a LOAD-BEARING column
    the window evaluates; an order key qualifies, an expression does
    not, because _rowcap_guarded rewrites columns by name)."""
    for k in order_by:
        if isinstance(k, str):
            return k
    return None


def _global_dispatch_key(order_by: Sequence, caller: str) -> str:
    key = _first_str_key(order_by)
    if key is None:
        raise ValueError(
            f"{caller}: dispatch_max_rows requires at least one plain "
            "column name in order_by (the in-plan rowcap guard wraps it);"
            " pass names + ascending=[...] instead of Column expressions"
        )
    return key


def ranged_with_local_index(
    df: DataFrame, order_by: Sequence, num_partitions: int | None = None
) -> DataFrame:
    """Range-partition + locally sort ``df`` by ``order_by`` and attach
    ``__rk_pid`` (partition id) and ``__rk_lrn`` (1-based local row number).

    Materializes via localCheckpoint so every downstream job sees one frozen
    partition layout (see module docstring).  Global order == (pid, lrn).
    """
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = _order_cols(order_by)
    ranged = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__rk_mid", F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftright("__rk_mid", _MID_SHIFT).cast("int"))
        .withColumn(_LRN, (F.col("__rk_mid").bitwiseAND(_MID_MASK) + 1))
        .drop("__rk_mid")
    )
    return ranged.localCheckpoint(eager=True)


def partition_offsets(local: DataFrame, sum_cols: Iterable[str] = ()) -> DataFrame:
    """Per-partition row counts -> exclusive cumulative offsets.

    Input is the frame from ranged_with_local_index; output is one row per
    non-empty partition: (__rk_pid, __rk_off[, __rk_cum_<c> ...]).  The
    cumulative window here runs over <= num_shuffle_partitions rows — bounded
    by config, the documented exception to the no-global-window rule.
    """
    aggs = [F.count("*").alias(_CNT)]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"__rk_s_{c}"))
        # non-null count per partition: lets global_running_sum reproduce
        # SQL's NULL-until-first-non-null running-sum semantics exactly
        aggs.append(F.count(c).alias(f"__rk_nn_{c}"))
    counts = local.groupBy(_PID).agg(*aggs)
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    out = counts.select(
        _PID,
        F.col(_CNT),  # kept so consumers can derive totals without a rescan
        F.coalesce(F.sum(_CNT).over(w), F.lit(0)).cast("bigint").alias(_OFF),
        *[
            c
            for pair in (
                (
                    F.coalesce(F.sum(f"__rk_s_{c}").over(w), F.lit(0)).alias(
                        f"__rk_cum_{c}"
                    ),
                    F.coalesce(F.sum(f"__rk_nn_{c}").over(w), F.lit(0))
                    .cast("bigint")
                    .alias(f"__rk_cumn_{c}"),
                )
                for c in sum_cols
            )
            for c in pair
        ],
    )
    return out


def global_row_number(
    df: DataFrame,
    order_by: Sequence,
    col_name: str = "rn",
    num_partitions: int | None = None,
    dispatch_max_rows: int | None = None,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """df + a global 1-based row_number over ``order_by`` — the distributed
    equivalent of ``row_number() OVER (ORDER BY ...)``.  For a deterministic
    rn pass a total order (unique tie-break); for rank/tie-insensitive
    consumers (min-rn per group) ties may be left unresolved.

    SKEW CAVEAT: RangePartitioner cannot split EQUAL key tuples — every row
    sharing one ``order_by`` value lands in one partition.  A heavily-tied
    order column (worst case: a constant) therefore quietly recreates the
    single-task problem.  ALWAYS include a high-cardinality tie-break column
    (an id) in ``order_by`` even for tie-insensitive consumers: for RANK-like
    reductions (min rn per key group) the tie order is irrelevant to the
    result, but it lets the ranged shuffle split the tied run across
    partitions.  Pinned by test_ranking.test_tied_keys_split_with_tiebreak.

    ``dispatch_max_rows`` opts into the size-adaptive dispatch the grouped
    primitives have had since r7 (see grouped_row_number / dispatch_small's
    persist-then-count cost model: enable only where the input is an
    AGGREGATE of the fact, never on fact-grain frames — an over-cap probe
    pays one full cache write of the input): under the cap the plain
    single-partition window runs, re-proving the bound IN-PLAN
    (bounded_global_row_number's rowcap assert — the census recognizes the
    ``__bounded_`` marker feeding the Exchange SinglePartition); over it,
    this distributed machinery.  Per-key direction for the dispatch form
    comes from ``ascending`` (plain names only), the global_rank
    convention."""
    if dispatch_max_rows is not None:
        _global_dispatch_key(order_by, "global_row_number")
        if dispatch_small(df, dispatch_max_rows):
            return bounded_global_row_number(
                df, order_by, col_name=col_name,
                max_rows=int(dispatch_max_rows), ascending=ascending,
                caller="global_row_number",
            )
    local = ranged_with_local_index(
        df, _ordered_cols_with_asc(order_by, ascending), num_partitions
    )
    off = partition_offsets(local)
    return (
        local.join(F.broadcast(off), _PID)
        .withColumn(col_name, (F.col(_OFF) + F.col(_LRN)).cast("bigint"))
        .drop(_PID, _LRN, _OFF, _CNT)
    )


def bounded_global_row_number(
    df: DataFrame,
    order_by: Sequence,
    col_name: str = "rn",
    max_rows: int = FASTPATH_MAX_ROWS,
    ascending: Sequence[bool] | None = None,
    caller: str = "bounded_global_row_number",
) -> DataFrame:
    """Plain ``row_number() OVER (ORDER BY ...)`` over a frame PROVEN
    small at execution time — the size-adaptive fast path of
    global_row_number, guarded by the same in-plan rowcap assert as the
    bounded_rows_* forms (_rowcap_guarded wraps the first plain-string
    order key, so the ``__bounded_rowcap_asserted`` marker survives into
    the plan feeding the single-partition exchange and the census
    classifies it bounded — backed by the runtime assert, which fails
    loudly on any oversized input)."""
    key = _global_dispatch_key(order_by, caller)
    guarded = _rowcap_guarded(df, [key], max_rows, caller)
    w = Window.orderBy(*_ordered_cols_with_asc(order_by, ascending))
    return guarded.withColumn(
        col_name, F.row_number().over(w).cast("bigint")
    )


def global_ntile(
    df: DataFrame,
    order_by: Sequence,
    n_tiles: int,
    col_name: str = "tile",
    num_partitions: int | None = None,
    dispatch_max_rows: int | None = None,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """df + SQL-exact NTILE(n) over a global order: the first (total % n)
    tiles get ceil(total/n) rows, the rest floor(total/n) — bit-identical to
    ANSI/DuckDB NTILE, computed from the distributed row number + one scalar
    total (broadcast 1-row aggregate), never a single-partition window.

    ``dispatch_max_rows`` opts into the size-adaptive dispatch (see
    global_row_number: aggregate-grain inputs only): under the cap the
    assert-guarded plain NTILE window runs (bounded_global_ntile —
    native ``F.ntile`` IS the same ANSI NTILE the arithmetic here
    reproduces), over it this distributed machinery."""
    if dispatch_max_rows is not None:
        _global_dispatch_key(order_by, "global_ntile")
        if dispatch_small(df, dispatch_max_rows):
            return bounded_global_ntile(
                df, order_by, n_tiles, col_name=col_name,
                max_rows=int(dispatch_max_rows), ascending=ascending,
                caller="global_ntile",
            )
    local = ranged_with_local_index(
        df, _ordered_cols_with_asc(order_by, ascending), num_partitions
    )
    off = partition_offsets(local)
    # scalar total from the tiny offsets frame (last offset + last count) —
    # no second scan of the checkpointed data
    total = off.agg(
        F.max(F.col(_OFF) + F.col(_CNT)).cast("bigint").alias("__rk_total")
    )
    # all tile arithmetic in bigint `div` (never Column `/`, which is a
    # DOUBLE divide and can round across an integer boundary near 2^53)
    k = int(n_tiles)
    joined = (
        local.join(F.broadcast(off), _PID)
        .crossJoin(F.broadcast(total))
        .withColumn("__rk_rn", (F.col(_OFF) + F.col(_LRN)).cast("bigint"))
        .withColumn("__rk_base", F.expr(f"__rk_total div {k}"))
        .withColumn("__rk_rem", F.expr(f"__rk_total % {k}"))
    )
    big = F.col("__rk_base") + 1  # size of the first `rem` (larger) tiles
    cut = big * F.col("__rk_rem")  # rows covered by the larger tiles
    tile = (
        F.when(F.col("__rk_base") == 0, F.col("__rk_rn"))
        .when(
            F.col("__rk_rn") <= cut,
            # ceil(rn / big) with big = base + 1, all-integer
            F.expr("(__rk_rn + __rk_base) div (__rk_base + 1)"),
        )
        .otherwise(
            F.col("__rk_rem")
            + F.expr(
                "(__rk_rn - (__rk_base + 1) * __rk_rem + __rk_base - 1)"
                " div __rk_base"
            )
        )
    )
    # identity clamp: tile ∈ 1..k by construction, so pmod(tile−1, k)+1
    # == tile — but it makes the 1..k domain VISIBLE to plan analysis
    # (plans._spc_key_bounded), so an aggregate grouped on the ntile
    # output is provably bounded in the single-partition census
    tile = F.pmod(tile - 1, F.lit(int(n_tiles)).cast("bigint")) + 1
    return joined.withColumn(col_name, tile.cast("int")).drop(
        _PID, _LRN, _OFF, _CNT, "__rk_total", "__rk_rn", "__rk_base", "__rk_rem"
    )


def bounded_global_ntile(
    df: DataFrame,
    order_by: Sequence,
    n_tiles: int,
    col_name: str = "tile",
    max_rows: int = FASTPATH_MAX_ROWS,
    ascending: Sequence[bool] | None = None,
    caller: str = "bounded_global_ntile",
) -> DataFrame:
    """Plain ``NTILE(n) OVER (ORDER BY ...)`` over a frame proven small
    at execution time — the size-adaptive fast path of global_ntile
    (same rowcap-assert proof machinery as bounded_global_row_number).
    Keeps global_ntile's pmod identity clamp so the 1..n tile domain
    stays visible to the plan census (downstream aggregates grouped on
    the tile remain provably bounded)."""
    key = _global_dispatch_key(order_by, caller)
    guarded = _rowcap_guarded(df, [key], max_rows, caller)
    w = Window.orderBy(*_ordered_cols_with_asc(order_by, ascending))
    k = int(n_tiles)
    tile = (
        F.pmod(
            F.ntile(k).over(w).cast("bigint") - 1,
            F.lit(k).cast("bigint"),
        )
        + 1
    )
    return guarded.withColumn(col_name, tile.cast("int"))


def global_rank(
    df: DataFrame,
    order_by: Sequence,
    col_name: str = "rank",
    dense: bool = False,
    num_partitions: int | None = None,
    ascending: Sequence[bool] | None = None,
    dispatch_max_rows: int | None = None,
) -> DataFrame:
    """df + SQL RANK() (gaps after ties) or DENSE_RANK() over a global
    order — distributed: global_row_number with an arbitrary tie order,
    then the tie-insensitive reduction per key group (min rn for RANK; a
    dense index from the ordered distinct-key frame for DENSE_RANK). The
    per-key windows are PARTITIONED by the full order tuple — parallel by
    construction; the dense path re-ranks only the distinct-key frame.

    ``order_by`` must be plain column names (rank semantics group back on
    them); per-key direction comes from ``ascending`` (default all-ASC),
    e.g. ``global_rank(df, ["n"], ascending=[False])`` for
    ``RANK() OVER (ORDER BY n DESC)``.

    ``dispatch_max_rows`` passes through to the internal per-key frames
    (the per-key count aggregate / the distinct-key frame — both
    aggregate-grain by construction, the documented dispatch cost-model
    fit): under the cap they take the assert-guarded plain-window fast
    path instead of the ranged machinery."""
    keys = [c for c in order_by if isinstance(c, str)]
    if len(keys) != len(list(order_by)):
        # Column expressions (e.g. F.desc) have no stable name to group
        # back on; callers pass plain column names + `ascending` flags
        raise ValueError(
            "global_rank requires plain column names (pass direction via "
            "ascending=[...])"
        )
    asc = list(ascending) if ascending is not None else [True] * len(keys)
    if len(asc) != len(keys):
        raise ValueError("ascending must match order_by length")
    ordered = [
        F.col(k) if a else F.col(k).desc() for k, a in zip(keys, asc)
    ]
    if not dense:
        # RANK is key-grain: rank(v) = 1 + count of strictly-preceding
        # rows. Aggregate to per-key counts FIRST (the hash shuffle
        # splits tied rows across partitions), run the distributed
        # running sum over the DISTINCT-key frame only, and join the
        # ≤|distinct keys| rank table back. This never range-partitions
        # tied rows — the old full-frame ranged pass put every row of a
        # hot key in ONE partition (the documented RangePartitioner
        # tied-key limit); now only the per-key COUNT row lands there.
        vals = df.groupBy(*keys).agg(F.count("*").alias("__rk_kc"))
        cum = global_running_sum(
            vals, keys, ["__rk_kc"], ["__rk_kcum"],
            num_partitions=num_partitions, ascending=asc,
            dispatch_max_rows=dispatch_max_rows,
        )
        ranks = cum.select(
            *keys,
            (F.col("__rk_kcum") - F.col("__rk_kc") + 1)
            .cast("bigint")
            .alias(col_name),
        )
        return _join_back_null_safe(df, ranks, keys)
    # dense: rank the DISTINCT key tuples (a far smaller frame), then map
    # each row to its key's dense index through a (null-safe) equi-join
    distinct_keys = df.select(*keys).distinct()
    dense_idx = global_row_number(
        distinct_keys, keys, col_name=col_name,
        num_partitions=num_partitions, ascending=asc,
        dispatch_max_rows=dispatch_max_rows,
    )
    return _join_back_null_safe(df, dense_idx, keys)


def _join_back_null_safe(
    df: DataFrame,
    lookup: DataFrame,
    keys: list[str],
    broadcast: bool = False,
) -> DataFrame:
    """Inner-join `lookup` back onto `df` on `keys` with NULL-SAFE
    equality: SQL window ranks treat NULL as an ordinary (first) key
    value, so a plain equi-join (null ≠ null) would silently DROP
    NULL-keyed rows from the result.

    The lookup's payload (non-key) columns must be absent from `df`:
    a silent duplicate would only explode at a later select, so it is
    rejected here — matching the error behavior of the withColumn-based
    predecessors these joins replaced."""
    clash = [
        c for c in lookup.columns if c not in keys and c in df.columns
    ]
    if clash:
        raise ValueError(
            "join-back payload column(s) already exist on the input "
            f"frame: {clash} — rename the output column"
        )
    renamed = lookup.select(
        *[F.col(k).alias(f"__rk_j_{k}") for k in keys],
        *[c for c in lookup.columns if c not in keys],
    )
    if broadcast:
        renamed = F.broadcast(renamed)
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__rk_j_{k}"))
        cond = c if cond is None else cond & c
    return df.join(renamed, cond).drop(*[f"__rk_j_{k}" for k in keys])


def _guard_group_cardinality(
    off: DataFrame, guard_col: str, max_groups: int, caller: str
) -> DataFrame:
    """In-plan cardinality guard for the per-group rebase frames the
    grouped primitives force-broadcast: group count is only
    policy-bounded (enums / 10⁴–10⁵ shard ids), and a caller feeding a
    data-proportional key would get a driver-sized broadcast plus an
    unpartitioned window where the plain per-group window degrades
    gracefully.  A scalar count of the (already tiny) rebase frame is
    cross-joined back and an assert_true wraps `guard_col`, which must
    be a JOIN KEY of the downstream join-back: a payload column is
    column-pruned under count()-only plans and the assert would vanish
    with it, but the join key is load-bearing in every consumer plan
    (same fail-loud idiom as the dedup/ANN occupancy caps)."""
    cnt = off.groupBy().agg(F.count("*").alias("__rk_ng"))
    guarded = F.when(
        F.assert_true(
            F.col("__rk_ng") <= F.lit(int(max_groups)),
            F.lit(
                f"{caller}: group-key cardinality exceeds "
                f"max_groups={int(max_groups)} — the broadcast rebase "
                "frame is only safe for policy-bounded group counts; "
                "use a plain partitioned window for data-proportional "
                "keys or raise max_groups deliberately"
            ),
        ).isNull(),
        F.col(guard_col),
    )
    return (
        off.crossJoin(F.broadcast(cnt))
        .withColumn(guard_col, guarded)
        .drop("__rk_ng")
    )


# --- per-group (PARTITION BY enum) distributed forms ----------------------
#
# `Window.partitionBy(<enum>)` over a fact-grain frame fans the WHOLE input
# into ≤|domain| tasks (5 market segments = 5 tasks forever, no matter the
# cluster) — the per-key cousin of the single-partition collapse, flagged
# by plans.bounded_key_fanins. These helpers express the same semantics on
# the distributed machinery above: rank the global (group ++ order) total
# order, then rebase each group by a broadcast per-group offset (a
# ≤|domain|-row frame). The group key set must be BOUNDED-DOMAIN (that is
# what makes the rebase frame broadcastable) — which is exactly the case
# where the plain partitioned window cannot scale.


def probe_rows(df: DataFrame, cap: int) -> list | None:
    """Limit-guarded dispatch probe (r10 VERDICT #6: one shared helper
    instead of hand-rolled copies at every size-adaptive call site).

    Collects ``df`` under ``limit(cap + 1)`` — ONE job that either proves
    the frame bounded (returns the COMPLETE row list, ``len(rows) <=
    cap``) or overflows (returns ``None``: route to the distributed
    path). ``cap <= 0`` disables the probe (returns ``None`` without
    running a job) — the forced-distributed escape hatch. CollectLimit on
    a multi-partition frame runs incremental partial jobs (~0.35 s
    overhead locally) — cheaper than a separate count job and, unlike a
    plain collect, safe against an unexpectedly huge input."""
    if cap <= 0:
        return None
    rows = df.limit(int(cap) + 1).collect()
    return rows if len(rows) <= cap else None


def dispatch_small(df: DataFrame, max_rows: int) -> bool:
    """Routing probe for the size-adaptive dispatch. The driver-side
    count would otherwise recompute the (often aggregate) input once for
    routing and once for the query — so the frame persists FIRST, the
    count materializes the cache, and the fast path reads it back
    (measured ~2x on quantiles_exact_weighted at sf0.1).

    Over the cap the entry is KEPT too (r12, ADVICE r11): the
    distributed machinery the caller falls back to starts with
    ``repartitionByRange``, whose RangePartitioner sampling job plus the
    shuffle itself execute the input plan TWICE — Catalyst's plan-cache
    substitution points both at the materialized probe frame instead, so
    the over-cap probe's cache write now BUYS back the sampler recompute
    rather than being thrown away (the r11 form released it and paid one
    full extra recompute of the input). The residual over-cap cost is
    the cache write itself plus transient MEMORY_AND_DISK residency of
    one input-sized frame — which the ranged machinery's eager
    localCheckpoint was about to duplicate anyway. Enable dispatch only
    on aggregate-grain inputs all the same: on a fact-grain frame the
    cache WRITE is the dominant cost (the r11-documented reverts at
    q_global_rank_price_points / q_negative_sampling_table /
    q_key_skew_report measured exactly that) and keeping it does not
    amortize a write that should never happen.

    The persist registers in the package-wide runtime_cache under the
    plan's semanticHash (r9, ADVICE r8: the persists previously
    accumulated unobserved for the session lifetime) — one entry per
    distinct plan, re-probing a seen plan reuses the entry, the family
    is FIFO-capped at DISPATCH_CACHE_MAX (ADVICE r9), and
    ``runtime_cache.release("dispatch")`` drops them all. A 32-bit
    semanticHash collision could at worst misroute (return a wrong
    count); the fast path's in-plan rowcap assert still fails loudly on
    any oversized input, so correctness never rides the hash."""
    from .. import runtime_cache as _rc

    h = int(df._jdf.queryExecution().analyzed().semanticHash())
    key = ("dispatch", h)
    cached = _rc.cached_frame(df, key, lambda: df)
    small = cached.count() <= int(max_rows)
    _rc.cap_family("dispatch", DISPATCH_CACHE_MAX)
    return small


def bounded_rows_row_number(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence,
    col_name: str = "rn",
    max_rows: int = FASTPATH_MAX_ROWS,
    caller: str = "bounded_rows_row_number",
) -> DataFrame:
    """Plain ``row_number() OVER (PARTITION BY groups ORDER BY order)``
    over a frame PROVEN small at execution time — the size-adaptive fast
    path of the grouped primitives (r7 VERDICT #3).

    The proof is in-plan, not declared: a scalar count of the input is
    cross-joined back (broadcast) and an assert_true caps it at
    ``max_rows``, wrapping the FIRST GROUP KEY — the window partition
    key, so Catalyst cannot prune the assert out of any consumer plan
    (same fail-loud idiom as _guard_group_cardinality and the dedup/ANN
    occupancy caps).  The count column is NAMED with the census's
    ``__bounded_`` marker prefix (``__bounded_rowcap_asserted``): it is
    referenced by the assert inside the guarded key, so it survives
    column pruning into the plan text, and the census recognizes the
    guarded frame as bounded — unlike the checkpoint markers this one
    is BACKED by the runtime assert: feed it more than max_rows and the
    query fails loudly instead of fanning a fact into ≤|domain| tasks.

    Use via ``grouped_row_number(..., dispatch_max_rows=...)``, which
    only takes this path after a driver-side count confirms the bound
    (a persist-then-count probe — see dispatch_small's cost model);
    calling it directly on an
    oversized frame is the negative control — the assert fires."""
    gcols = list(group_by)
    guarded = _rowcap_guarded(df, gcols, max_rows, caller)
    w = Window.partitionBy(*gcols).orderBy(*_order_cols(order_by))
    return guarded.withColumn(
        col_name, F.row_number().over(w).cast("bigint")
    )


def _rowcap_guarded(
    df: DataFrame, gcols: Sequence[str], max_rows: int, caller: str
) -> DataFrame:
    """The in-plan row-count proof behind every bounded_rows_* fast path:
    broadcast scalar count + assert_true wrapping the first group key
    (the window partition key — unprunable in any window-executing
    plan); the count column carries the census's ``__bounded_`` marker
    prefix so the guarded frame classifies as bounded."""
    cnt = df.groupBy().agg(
        F.count("*").alias("__bounded_rowcap_asserted")
    )
    guarded_key = F.when(
        F.assert_true(
            F.col("__bounded_rowcap_asserted") <= F.lit(int(max_rows)),
            F.lit(
                f"{caller}: input frame exceeds max_rows={int(max_rows)}"
                " — the plain-window fast path is only safe for frames "
                "proven small; use the distributed grouped machinery "
                "for data-proportional inputs"
            ),
        ).isNull(),
        F.col(gcols[0]),
    )
    return (
        df.crossJoin(F.broadcast(cnt))
        .withColumn(gcols[0], guarded_key)
        .drop("__bounded_rowcap_asserted")
    )


def bounded_rows_running_sum(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence,
    value_cols: Sequence[str],
    out_names: Sequence[str],
    max_rows: int = FASTPATH_MAX_ROWS,
    caller: str = "bounded_rows_running_sum",
) -> DataFrame:
    """Plain ``SUM(c) OVER (PARTITION BY groups ORDER BY order ROWS
    UNBOUNDED PRECEDING)`` over a frame proven small at execution time —
    the size-adaptive fast path of grouped_running_sum, same proof
    machinery as bounded_rows_row_number (_rowcap_guarded). The plain
    window's native NULL semantics ARE the SQL semantics the grouped
    machinery reproduces with its NULL-carry, so values match exactly."""
    gcols = list(group_by)
    guarded = _rowcap_guarded(df, gcols, max_rows, caller)
    w = (
        Window.partitionBy(*gcols)
        .orderBy(*_order_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c, name in zip(value_cols, out_names):
        guarded = guarded.withColumn(name, F.sum(c).over(w))
    return guarded


def grouped_row_number(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence,
    col_name: str = "rn",
    num_partitions: int | None = None,
    max_groups: int = 1_000_000,
    dispatch_max_rows: int | None = None,
) -> DataFrame:
    """df + ``row_number() OVER (PARTITION BY groups ORDER BY order)``
    for bounded-domain groups, without fanning the fact into ≤|domain|
    tasks: distributed global row_number over (groups ++ order), then
    each group rebases by its broadcast min-rn (null-safe join — NULL is
    an ordinary group value).  Group cardinality is enforced in-plan at
    ``max_groups`` (the rebase frame is force-broadcast — see
    _guard_group_cardinality).

    ``dispatch_max_rows`` opts into size-adaptive dispatch: a
    persist-then-count probe of the input (dispatch_small: the cache
    write is the point — the fast path reads it back instead of
    recomputing an aggregate input)
    picks the plain-window fast path when the frame is within the cap —
    recovering the 1-to-2-task cost the distributed machinery's
    constant overhead dwarfs at local scale — and this machinery
    otherwise.  The fast path re-proves the bound IN-PLAN
    (bounded_rows_row_number's assert), so the census's boundedness
    claim holds at execution time, not just at dispatch time."""
    gcols = list(group_by)
    if dispatch_max_rows is not None:
        if dispatch_small(df, dispatch_max_rows):
            return bounded_rows_row_number(
                df, gcols, order_by, col_name=col_name,
                max_rows=int(dispatch_max_rows),
                caller="grouped_row_number",
            )
    rn = global_row_number(
        df, [*gcols, *order_by], col_name="__rk_grn",
        num_partitions=num_partitions,
    )
    off = rn.groupBy(*gcols).agg(F.min("__rk_grn").alias("__rk_gmin"))
    off = _guard_group_cardinality(
        off, gcols[0], max_groups, "grouped_row_number"
    )
    out = _join_back_null_safe(rn, off, gcols, broadcast=True)
    return out.withColumn(
        col_name, (F.col("__rk_grn") - F.col("__rk_gmin") + 1).cast("bigint")
    ).drop("__rk_grn", "__rk_gmin")


def grouped_top_k(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence,
    k: int,
    col_name: str = "rn",
    num_partitions: int | None = None,
    dispatch_max_rows: int | None = None,
) -> DataFrame:
    """Top-k rows PER GROUP (the LIMIT ... BY / lateral-top-k shape)
    with the per-group row number attached — grouped_row_number +
    filter.  ``dispatch_max_rows`` passes through to the size-adaptive
    fast-path dispatch."""
    return grouped_row_number(
        df, group_by, order_by, col_name=col_name,
        num_partitions=num_partitions,
        dispatch_max_rows=dispatch_max_rows,
    ).filter(F.col(col_name) <= int(k))


def with_ntile_from_rn(
    df: DataFrame,
    rn_col: str,
    total_col: str,
    n_tiles: int,
    out_col: str = "tile",
) -> DataFrame:
    """SQL-exact NTILE(k) computed from a 1-based row number column and
    its partition-total column — the same all-bigint `div` tile
    arithmetic as global_ntile, reusable for grouped forms (attach
    grouped_row_number + a broadcast per-group total, then this).
    Column names are backtick-quoted into the generated expression
    (embedded backticks doubled, Spark's quoted-identifier escape), so
    non-identifier names (dots, spaces, hyphens, backticks) bind
    correctly instead of breaking or injecting into the expression."""
    k = int(n_tiles)
    rn_col = "`%s`" % rn_col.replace("`", "``")
    total_col = "`%s`" % total_col.replace("`", "``")
    base = f"({total_col} div {k})"
    rem = f"({total_col} % {k})"
    expr = (
        f"CAST(CASE WHEN {base} = 0 THEN {rn_col} "
        f"WHEN {rn_col} <= ({base} + 1) * {rem} "
        f"THEN ({rn_col} + {base}) div ({base} + 1) "
        f"ELSE {rem} + ({rn_col} - ({base} + 1) * {rem} + {base} - 1) "
        f"div {base} END AS INT)"
    )
    return df.withColumn(out_col, F.expr(expr))


def grouped_running_sum(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence,
    value_cols: Sequence[str],
    out_names: Sequence[str],
    num_partitions: int | None = None,
    max_groups: int = 1_000_000,
    dispatch_max_rows: int | None = None,
) -> DataFrame:
    """df + per-group inclusive running sums —
    ``SUM(c) OVER (PARTITION BY groups ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` for bounded-domain groups: the distributed GLOBAL
    running sum over (groups ++ order) minus each group's broadcast
    exclusive prefix total (group totals fold off the same checkpointed
    frame — no second input scan; the prefix window runs over the
    ≤|domain|-row group-total frame).

    NULL semantics match the SQL window form exactly: alongside each
    value's running sum, the global pass carries a running NON-NULL
    count of an always-defined 0/1 indicator; a row whose GROUP prefix
    holds no non-null value yields NULL (not the 0 the subtraction
    alone would surface), otherwise NULLs are skipped.

    Group cardinality is enforced in-plan at ``max_groups`` (the rebase
    frame is force-broadcast — see _guard_group_cardinality).

    ``dispatch_max_rows`` opts into the size-adaptive dispatch (see
    grouped_row_number): a driver-side count picks the assert-guarded
    plain-window fast path (bounded_rows_running_sum) under the cap."""
    gcols = list(group_by)
    if dispatch_max_rows is not None:
        if dispatch_small(df, dispatch_max_rows):
            return bounded_rows_running_sum(
                df, gcols, order_by, value_cols, out_names,
                max_rows=int(dispatch_max_rows),
                caller="grouped_running_sum",
            )
    ind = {c: f"__rk_gnn_{c}" for c in value_cols}
    src = df
    for c in value_cols:
        # non-null indicator: never NULL itself, so its running sum is
        # the per-prefix non-null count of c
        src = src.withColumn(
            ind[c], F.col(c).isNotNull().cast("bigint")
        )
    tmp = [f"__rk_gcs_{c}" for c in value_cols]
    tmpn = [f"__rk_gcn_{c}" for c in value_cols]
    cum = global_running_sum(
        src, [*gcols, *order_by],
        [*value_cols, *ind.values()], [*tmp, *tmpn],
        num_partitions=num_partitions,
    )
    gt = cum.groupBy(*gcols).agg(
        *[F.sum(c).alias(f"__rk_gt_{c}") for c in value_cols],
        *[F.sum(ind[c]).alias(f"__rk_gtn_{c}") for c in value_cols],
    )
    w = Window.orderBy(*gcols).rowsBetween(Window.unboundedPreceding, -1)
    # cardinality guard rides the SAME window pass as the prefix sums
    # (one more frame over an identical sort spec — no extra exchange,
    # unlike grouped_row_number's cross-joined scalar count) and wraps
    # the join key, which every consumer plan keeps
    w_full = Window.orderBy(*gcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    guard_key = F.when(
        F.assert_true(
            F.count("*").over(w_full) <= F.lit(int(max_groups)),
            F.lit(
                "grouped_running_sum: group-key cardinality exceeds "
                f"max_groups={int(max_groups)} — the broadcast rebase "
                "frame is only safe for policy-bounded group counts; "
                "use a plain partitioned window for data-proportional "
                "keys or raise max_groups deliberately"
            ),
        ).isNull(),
        F.col(gcols[0]),
    ).alias(gcols[0])
    goff = gt.select(
        guard_key,
        *gcols[1:],
        *[
            F.coalesce(F.sum(f"__rk_gt_{c}").over(w), F.lit(0)).alias(
                f"__rk_goff_{c}"
            )
            for c in value_cols
        ],
        *[
            F.coalesce(F.sum(f"__rk_gtn_{c}").over(w), F.lit(0)).alias(
                f"__rk_goffn_{c}"
            )
            for c in value_cols
        ],
    )
    out = _join_back_null_safe(cum, goff, gcols, broadcast=True)
    for c, t, tn, name in zip(value_cols, tmp, tmpn, out_names):
        grp_nn = F.col(tn) - F.col(f"__rk_goffn_{c}")
        out = out.withColumn(
            name,
            F.when(grp_nn == 0, F.lit(None)).otherwise(
                F.coalesce(F.col(t), F.lit(0)) - F.col(f"__rk_goff_{c}")
            ),
        )
    return out.drop(
        *tmp, *tmpn, *ind.values(),
        *[f"__rk_goff_{c}" for c in value_cols],
        *[f"__rk_goffn_{c}" for c in value_cols],
    )


def global_running_sum(
    df: DataFrame,
    order_by: Sequence,
    value_cols: Sequence[str],
    out_names: Sequence[str],
    num_partitions: int | None = None,
    dispatch_max_rows: int | None = None,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """df + inclusive running sums of ``value_cols`` over the global
    ``order_by`` — ``SUM(c) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    distributed as: per-partition running sum (+ one narrow hash shuffle on
    the partition id, parallel across partitions) plus broadcast exclusive
    prefix totals from the tiny per-partition count frame.

    NULL semantics match the SQL window form exactly: a row whose global
    prefix contains no non-null value yields NULL; otherwise NULLs are
    skipped.  (The prefix totals are coalesced to 0, so a per-partition
    non-null count — also carried in the offsets frame — decides the
    NULL-vs-0 edge.)

    ``dispatch_max_rows`` opts into the size-adaptive dispatch (see
    global_row_number: aggregate-grain inputs only): under the cap the
    assert-guarded plain window runs (bounded_global_running_sum — the
    native window's NULL semantics ARE the semantics above), over it
    this distributed machinery."""
    if dispatch_max_rows is not None:
        _global_dispatch_key(order_by, "global_running_sum")
        if dispatch_small(df, dispatch_max_rows):
            return bounded_global_running_sum(
                df, order_by, value_cols, out_names,
                max_rows=int(dispatch_max_rows), ascending=ascending,
                caller="global_running_sum",
            )
    local = ranged_with_local_index(
        df, _ordered_cols_with_asc(order_by, ascending), num_partitions
    )
    off = partition_offsets(local, sum_cols=value_cols)
    w = (
        Window.partitionBy(_PID)
        .orderBy(_LRN)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = local.join(F.broadcast(off), _PID)
    for c, name in zip(value_cols, out_names):
        seen = F.col(f"__rk_cumn_{c}") + F.count(c).over(w)
        out = out.withColumn(
            name,
            F.when(seen == 0, F.lit(None)).otherwise(
                F.col(f"__rk_cum_{c}") + F.coalesce(F.sum(c).over(w), F.lit(0))
            ),
        )
    drop = [_PID, _LRN, _OFF, _CNT] + [
        f"__rk_cum_{c}" for c in value_cols
    ] + [f"__rk_cumn_{c}" for c in value_cols]
    return out.drop(*drop)


def bounded_global_running_sum(
    df: DataFrame,
    order_by: Sequence,
    value_cols: Sequence[str],
    out_names: Sequence[str],
    max_rows: int = FASTPATH_MAX_ROWS,
    ascending: Sequence[bool] | None = None,
    caller: str = "bounded_global_running_sum",
) -> DataFrame:
    """Plain global ``SUM(c) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` over a frame proven small at execution time — the
    size-adaptive fast path of global_running_sum (same rowcap-assert
    proof machinery as bounded_global_row_number; the native window's
    NULL semantics are exactly the SQL semantics the distributed
    machinery reproduces with its NULL-carry)."""
    key = _global_dispatch_key(order_by, caller)
    guarded = _rowcap_guarded(df, [key], max_rows, caller)
    w = (
        Window.orderBy(*_ordered_cols_with_asc(order_by, ascending))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c, name in zip(value_cols, out_names):
        guarded = guarded.withColumn(name, F.sum(c).over(w))
    return guarded


def global_running_max(
    df: DataFrame,
    order_by: Sequence,
    value_col: str,
    col_name: str,
    num_partitions: int | None = None,
    exclusive: bool = False,
    dispatch_max_rows: int | None = None,
    ascending: Sequence[bool] | None = None,
) -> DataFrame:
    """df + running max of ``value_col`` over the global ``order_by`` —
    max is associative, so the stitch is: per-partition running max +
    broadcast exclusive prefix max of partition maxima (NULL for the
    first partition; greatest() skips NULLs).

    With ``exclusive=True`` the frame is
    ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` (the skyline /
    strictly-before shape): the local window excludes the current row and
    the first global row yields NULL — identical to the SQL form's empty
    frame.

    ``dispatch_max_rows`` opts into the size-adaptive dispatch (see
    global_row_number: aggregate-grain inputs only)."""
    if dispatch_max_rows is not None:
        _global_dispatch_key(order_by, "global_running_max")
        if dispatch_small(df, dispatch_max_rows):
            return bounded_global_running_max(
                df, order_by, value_col, col_name,
                max_rows=int(dispatch_max_rows), ascending=ascending,
                exclusive=exclusive, caller="global_running_max",
            )
    local = ranged_with_local_index(
        df, _ordered_cols_with_asc(order_by, ascending), num_partitions
    )
    pmax = local.groupBy(_PID).agg(F.max(value_col).alias("__rk_pm"))
    wp = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    pre = pmax.select(_PID, F.max("__rk_pm").over(wp).alias("__rk_prem"))
    hi = -1 if exclusive else 0
    wl = (
        Window.partitionBy(_PID)
        .orderBy(_LRN)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    return (
        local.join(F.broadcast(pre), _PID)
        .withColumn(
            col_name,
            F.greatest(F.max(value_col).over(wl), F.col("__rk_prem")),
        )
        .drop(_PID, _LRN, "__rk_prem")
    )


def bounded_global_running_max(
    df: DataFrame,
    order_by: Sequence,
    value_col: str,
    col_name: str,
    max_rows: int = FASTPATH_MAX_ROWS,
    ascending: Sequence[bool] | None = None,
    exclusive: bool = False,
    caller: str = "bounded_global_running_max",
) -> DataFrame:
    """Plain global running max over a frame proven small at execution
    time — the size-adaptive fast path of global_running_max (same
    rowcap-assert proof machinery as bounded_global_row_number; the
    exclusive form's empty first frame yields NULL, identical to the
    stitched form's NULL prefix)."""
    key = _global_dispatch_key(order_by, caller)
    guarded = _rowcap_guarded(df, [key], max_rows, caller)
    hi = -1 if exclusive else 0
    w = (
        Window.orderBy(*_ordered_cols_with_asc(order_by, ascending))
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    return guarded.withColumn(col_name, F.max(value_col).over(w))


def top_k(df: DataFrame, order_by: Sequence, k: int) -> DataFrame:
    """Global top-k: orderBy + limit plans as TakeOrderedAndProject — per
    partition keeps k rows, then one k-row merge on the driver side of the
    exchange.  THE scale-safe replacement for rank()<=k global windows."""
    return df.orderBy(*_order_cols(order_by)).limit(int(k))


def partitioned_run_counts(
    df: DataFrame,
    order_by: Sequence,
    value_cols: Sequence[str],
    num_partitions: int | None = None,
    bucket_by: Column | None = None,
) -> DataFrame:
    """Adjacent-run counts of each value column in the global ``order_by``
    order — ``sum((c != lag(c) OVER (ORDER BY ...))::int)`` with null-safe
    comparison — WITHOUT a single-partition window.

    Fully JVM-side: range-partition on the order keys, compute interior
    lag-changes inside a per-partition window (partitioned by the physical
    partition id — parallel across partitions, whole-stage codegen), fold
    to one summary row per partition (interior change count + first/last
    values via min_by/max_by on the local row number), then stitch the
    partition boundaries over the <= num_partitions-row summary frame.
    The very first global row counts as a change iff its value is non-null
    (lag = NULL, null-safe-unequal) — identical to the window form.

    Single-branch consumer (only the summaries read the ranged frame), so
    no localCheckpoint is needed: one ranged shuffle + one pid-hash shuffle
    of the projected columns, both JVM (an earlier mapInPandas variant paid
    ~2x in Arrow transfer of the full fact projection).

    ``bucket_by`` (r12, guide §2.5/§6): RangePartitioner SAMPLES its
    boundaries — ``repartitionByRange`` runs a whole extra pass over the
    projected input before the shuffle.  When the caller can supply a
    deterministic bucket expression that is (a) monotone non-decreasing
    in the ``order_by`` prefix and (b) constant within every tied
    order-key group (e.g. ``(key - min_key) div span`` over an integer
    key whose min/max came from pushed-down parquet footer stats), the
    sampling pass is unnecessary: rows hash-partition on the bucket (use
    20-100x more buckets than partitions so the hash spreads evenly —
    guide §2.5), the lag window partitions BY BUCKET, and the stitch
    orders the per-BUCKET summary frame by the bucket value itself, so
    the physical partition order never matters.  Exact same run counts,
    one fewer input pass, no sampler.

    Returns ONE row: n_rows bigint, runs_<c> bigint per value column.
    """
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = list(value_cols)
    cols_ord = _order_cols(order_by)
    if bucket_by is not None:
        local = (
            df.select(bucket_by.alias(_PID), *cols_ord, *cols)
            .repartition(n, F.col(_PID))
        )
    else:
        local = (
            df.select(*cols_ord, *cols)
            .repartitionByRange(n, *cols_ord)
            .withColumn(_PID, F.spark_partition_id())
        )
    w = Window.partitionBy(_PID).orderBy(*cols_ord)
    proj = [F.col(_PID), F.row_number().over(w).alias(_LRN)]
    for c in value_cols:
        proj.append(
            (~F.col(c).eqNullSafe(F.lag(c).over(w))).cast("long").alias(f"__chg_{c}")
        )
        proj.append(F.col(c))
    win = local.select(*proj)
    aggs = [F.count("*").alias("__rk_n")]
    for c in value_cols:
        aggs.append(
            F.sum(
                F.when(F.col(_LRN) > 1, F.col(f"__chg_{c}")).otherwise(F.lit(0))
            ).alias(f"__rk_runs_{c}")
        )
        aggs.append(F.min_by(c, _LRN).alias(f"__rk_first_{c}"))
        aggs.append(F.max_by(c, _LRN).alias(f"__rk_last_{c}"))
    # one summary row per partition — bounded by config, not data; the
    # marker column keeps that visible to the plan census
    # (plans.single_partition_collapses) alongside the Aggregate barrier
    summaries = (
        win.groupBy(_PID)
        .agg(*aggs)
        .withColumn("__bounded_one_row_per_partition", F.lit(1))
    )

    # boundary stitch over the tiny per-partition frame (<= N rows, N = config)
    w = Window.orderBy(_PID)
    stitched = summaries.select(
        "__bounded_one_row_per_partition",  # keep the marker visible to the census
        "__rk_n",
        *[
            (
                F.col(f"__rk_runs_{c}")
                + (
                    ~F.col(f"__rk_first_{c}").eqNullSafe(
                        F.lag(f"__rk_last_{c}").over(w)
                    )
                ).cast("long")
            ).alias(f"__rk_tot_{c}")
            for c in cols
        ],
    )
    return stitched.agg(
        F.sum("__rk_n").cast("bigint").alias("n_rows"),
        *[
            F.sum(f"__rk_tot_{c}").cast("bigint").alias(f"runs_{c}")
            for c in cols
        ],
    )
