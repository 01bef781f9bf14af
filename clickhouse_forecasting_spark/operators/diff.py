"""Snapshot diff: classify rows between two versions of a table.

The audit/reconciliation operator (what changed between yesterday's and
today's load?): a single full-outer join on the key columns classifies
every row as added / removed / changed / unchanged. One shuffle on the
keys; comparison is a hash over the non-key columns computed BEFORE the
join, so wide rows never travel twice and the join carries (key, hash)
pairs plus whichever payload the caller keeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Return (keys..., change) with change in added|removed|changed|unchanged.

    Row equality is md5 over all non-key columns cast to string in column
    order (NULL-sentineled) — order-stable and engine-portable.
    """
    value_cols = [c for c in old.columns if c not in keys]
    if old.columns != new.columns:
        raise ValueError(f"schemas differ: {old.columns} vs {new.columns}")

    def fp(df: DataFrame) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in value_cols
                ],
            )
        )
        return df.select(*keys, h.alias("_fp"))

    o = fp(old).withColumnRenamed("_fp", "_fp_old")
    n = fp(new).withColumnRenamed("_fp", "_fp_new")
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") == F.col("_fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, change.alias("change"))


def diff_summary(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Aggregate the diff to one row per change class."""
    return (
        snapshot_diff(old, new, keys)
        .groupBy("change")
        .agg(F.count("*").alias("n"))
    )
