"""Z-order (Morton) clustering for multi-dimension data skipping.

Parquet min/max page stats prune scans only along the SORT dimension: a
table sorted by date answers date filters cheaply but scatters user_id
across every row group. Interleaving the bits of two bucketized keys
gives one sort key that keeps BOTH dimensions locally narrow — each row
group then covers a small rectangle of (d1, d2) space, so min/max stats
prune selective filters on either column (the Delta/Iceberg OPTIMIZE
ZORDER idea, reduced to a pure-Spark expression + sortWithinPartitions).

Everything is built-in bit arithmetic (shiftleft/or) — JVM codegen, no
Python in the row path; the write is a normal sorted parquet write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map col into [0, 2^bits) by linear scaling over [lo, hi]."""
    span = F.greatest(hi - lo, F.lit(1e-12))
    scaled = (col.cast("double") - lo) / span * ((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled).cast("bigint"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zorder_key(b1: Column, b2: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two bucket ints: bit i of b1
    lands at position 2i+1, bit i of b2 at 2i. A closed-form expression
    tree (2*bits shifts + ors), fully codegen'd."""
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        bit1 = F.shiftright(b1, i).bitwiseAND(F.lit(1))
        bit2 = F.shiftright(b2, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(bit1, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bit2, 2 * i)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 16,
    files: int = 8,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of (c1, c2).

    Ranges for bucketization come from one tiny min/max aggregate (two
    rows of stats, broadcast as literals in the plan). `files` controls
    clustering granularity: repartitionByRange on the z-key puts each
    curve segment — a rectangle of key space — into its own file, so
    per-file min/max stats stay narrow on BOTH columns."""
    stats = df.agg(
        F.min(F.col(c1).cast("double")).alias("lo1"),
        F.max(F.col(c1).cast("double")).alias("hi1"),
        F.min(F.col(c2).cast("double")).alias("lo2"),
        F.max(F.col(c2).cast("double")).alias("hi2"),
    ).head()
    b1 = _bucketize(F.col(c1), F.lit(stats.lo1), F.lit(stats.hi1), bits)
    b2 = _bucketize(F.col(c2), F.lit(stats.lo2), F.lit(stats.hi2), bits)
    keyed = df.withColumn("_zkey", zorder_key(b1, b2, bits))
    (
        keyed.repartitionByRange(files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
