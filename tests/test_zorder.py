"""Z-order clustering: per-file parquet stats must be narrow on BOTH
dimensions (that is the entire point — a single-column sort leaves the
second dimension spanning its full range in every file)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from clickhouse_forecasting_spark.operators.zorder import write_zordered, zorder_key
from clickhouse_forecasting_spark.sources import read_table


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            out.append((min(los), max(his)))
    return out


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], ["a", "b"])
    key = df.select(
        zorder_key(F.col("a").cast("bigint"), F.col("b").cast("bigint"), bits=3).alias("k")
    ).head().k
    # a=101, b=011 -> interleave (a_i at 2i+1, b_i at 2i): 100111 = 39
    assert key == 0b100111 == 39


def test_zordered_files_are_narrow_in_both_dims(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(ev, zpath, "user_id", "day", files=8)
    # contrast: single-dimension sort on day only
    (
        ev.repartitionByRange(8, "day")
        .sortWithinPartitions("day")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    n_users = ev.select(F.max("user_id")).head()[0] + 1

    def avg_span(path, col, total):
        ranges = _file_ranges(path, col)
        assert ranges
        return sum(hi - lo for lo, hi in ranges) / len(ranges) / total

    z_user = avg_span(zpath, "user_id", n_users)
    lin_user = avg_span(lpath, "user_id", n_users)
    # the day-sorted layout leaves user_id spanning ~full range per file;
    # the z-ordered layout must cut that span at least in half
    assert lin_user > 0.9
    assert z_user < lin_user / 2, (z_user, lin_user)
    # and the z-layout still keeps day reasonably narrow (not a shuffle)
    n_days = ev.select(F.max("day")).head()[0] + 1
    assert avg_span(zpath, "day", n_days) < 0.75

    # row preservation: clustering is a pure layout change
    assert spark.read.parquet(zpath).count() == ev.count()
