"""Skew mitigation utilities.

First line of defense is AQE (enabled in session.py): runtime skew-join
splitting and partition coalescing. These helpers cover the case AQE can't
fix — a *single aggregation key* hot enough that one reducer task gets the
whole key (AQE can split skewed JOIN partitions, but a groupBy key is
indivisible at the shuffle layer).

``salted_agg`` does two-phase aggregation: a deterministic row-hash salt
spreads each hot key over `n_salts` reducers for the first (heavy) phase;
the second phase combines `n_salts` tiny partials per key. Correct for any
commutative-associative aggregate; the combine expression is supplied per
column (sum -> sum, count -> sum, max -> max, ...).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Salt from the row POSITION (partition id + offset), not row content:
    a hot key frequently consists of byte-identical rows, and any
    content-derived hash would give them all the same salt — no spread at
    all. monotonically_increasing_id is deterministic given the same input
    partitioning (safe for task retries), and commutative aggregates are
    insensitive to which salt shard a row lands in regardless."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (hot) fact side, replicate the dim side
    across all salt shards, join on (key, salt).

    Complements AQE skew splitting: AQE subdivides oversized sort-merge
    partitions at runtime, but when one key dominates BOTH the shuffle AND
    the reducer's build side, pre-spreading it over n_salts reducers keeps
    every task bounded. The dim side is replicated n_salts x — use only
    when dim is small relative to the fact table (the same precondition as
    a broadcast, which this generalizes when dim exceeds the broadcast
    threshold but still fits n_salts-way replication through the shuffle).

    Join-key columns from both inputs are preserved (the dim's key is
    dropped post-join as redundant); supported `how`: inner / left."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = with_salt(facts, n_salts)
    replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(replicated, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    combine_aggs: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial_aggs run per (keys + salt); combine_aggs() (built over the
    partial output columns) merge the salt shards per key. Example::

        salted_agg(df, ["k"],
                   [F.sum("v").alias("s"), F.count("*").alias("n")],
                   lambda: [F.sum("s").alias("s"), F.sum("n").alias("n")])
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*combine_aggs())
