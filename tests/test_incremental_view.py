"""Incremental materialized-view maintenance: applying event deltas must
converge to the same view a full-batch rollup produces, while touching
only the partitions the delta hits."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from clickhouse_forecasting_spark.operators.incremental import (
    delta_daily_rollup,
    maintain_daily_rollup,
    merge_additive,
)
from clickhouse_forecasting_spark.sources import read_table


def _view(spark, path):
    return {
        r.date: (r.event_count, r.total_value)
        for r in spark.read.parquet(path).collect()
    }


def test_incremental_equals_full_batch(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    view = str(tmp_path / "daily_view")
    # split the stream into three uneven deltas with overlapping days
    d1 = ev.filter(F.col("event_id") % 3 == 0)
    d2 = ev.filter(F.col("event_id") % 3 == 1)
    d3 = ev.filter(F.col("event_id") % 3 == 2)
    for d in (d1, d2, d3):
        maintain_daily_rollup(spark, d, view)
    got = _view(spark, view)
    want = {
        r.date: (r.event_count, r.total_value)
        for r in delta_daily_rollup(ev).collect()
    }
    assert set(got) == set(want)
    for day, (n, v) in want.items():
        assert got[day][0] == n, day
        assert got[day][1] == pytest.approx(v, rel=1e-9), day


def test_untouched_partitions_not_rewritten(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    days = sorted(r.d for r in ev.select("d").distinct().collect())
    view = str(tmp_path / "daily_view")
    maintain_daily_rollup(spark, ev.drop("d"), view)

    def mtimes():
        out = {}
        for part in os.listdir(view):
            if part.startswith("date="):
                pdir = os.path.join(view, part)
                out[part] = max(
                    os.path.getmtime(os.path.join(pdir, f))
                    for f in os.listdir(pdir)
                    if f.endswith(".parquet")
                )
        return out

    before = mtimes()
    # delta touches ONLY the last day
    last = days[-1]
    delta = ev.filter(F.col("d") == F.lit(last)).drop("d")
    maintain_daily_rollup(spark, delta, view)
    after = mtimes()
    changed = {p for p in before if after[p] != before[p]}
    assert changed == {f"date={last}"}
    # and the touched day's counts doubled (delta re-added its events)
    n_last = delta.count()
    got = _view(spark, view)
    full = {
        r.date: r.event_count for r in delta_daily_rollup(ev.drop("d")).collect()
    }
    assert got[last][0] == full[last] + n_last


def test_merge_additive_is_commutative(spark):
    a = spark.createDataFrame([("2024-01-01", 2, 10.0)], ["date", "event_count", "total_value"])
    b = spark.createDataFrame(
        [("2024-01-01", 3, 5.0), ("2024-01-02", 1, 1.0)],
        ["date", "event_count", "total_value"],
    )
    ab = {tuple(r) for r in merge_additive(a, b, ["date"]).collect()}
    ba = {tuple(r) for r in merge_additive(b, a, ["date"]).collect()}
    assert ab == ba == {("2024-01-01", 5, 15.0), ("2024-01-02", 1, 1.0)}


def test_snapshot_diff_classifies_all_cases(spark):
    from clickhouse_forecasting_spark.operators.diff import diff_summary, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0), (5, "e", 50.0)],
        ["k", "s", "v"],
    )
    got = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",  # NULL -> 30.0 must register as a change
        4: "unchanged",
        5: "added",
    }
    summary = {r.change: r.n for r in diff_summary(old, new, ["k"]).collect()}
    assert summary == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}


def test_snapshot_diff_identity_is_all_unchanged(spark, sf_dir):
    from clickhouse_forecasting_spark.operators.diff import diff_summary
    from clickhouse_forecasting_spark.sources import read_table

    orders = read_table(spark, sf_dir, "orders")
    summary = {r.change: r.n for r in diff_summary(orders, orders, ["o_orderkey"]).collect()}
    assert summary == {"unchanged": orders.count()}
