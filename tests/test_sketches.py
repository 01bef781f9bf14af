"""Accuracy and merge invariants for the DataSketches rollup queries.

HLL / KLL estimates have no DuckDB twin, so the gate here is the sketch's
own published error bound against the exact answer computed on the same
fixture — plus the merge laws (union >= parts, merged n == sum of parts)
that make sketches safe as pre-aggregated partials at 100 TB.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_hll_rollup_matches_exact_within_bound(spark, sf_dir, qs):
    rows = qs["sketch_rollup_daily_users"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    exact_total = ev.select("user_id").distinct().count()
    exact_daily = {
        str(r.day): r.n
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total = [r for r in rows if r.grain == "total"]
    assert len(total) == 1
    assert total[0].exact_users == exact_total
    # HLL default lgConfigK=12 -> ~1.6% standard error; the 5% (3 sigma)
    # bound is materialized in the query as a hashed verdict column
    assert total[0].approx_within_5pct
    days = [r for r in rows if r.grain == "day"]
    assert len(days) == len(exact_daily)
    for r in days:
        assert r.exact_users == exact_daily[r.key]
        assert r.approx_within_5pct
    assert sum(r.n_events for r in days) == total[0].n_events == ev.count()


def test_kll_quantiles_rank_accuracy(spark, sf_dir, qs):
    rows = qs["sketch_value_quantiles"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    by_type = {r.event_type: r for r in rows}
    assert "ALL" in by_type
    assert by_type["ALL"].n == ev.count()
    assert by_type["ALL"].n == sum(r.n for r in rows if r.event_type != "ALL")
    for etype, r in by_type.items():
        assert r.p50 <= r.p90 <= r.p99  # quantiles are monotone
        # the KLL estimate must land inside the exact +-5%-rank window;
        # the query hashes that verdict per quantile (KLL k=200
        # guarantees ~1.7% single-sided rank error at 99% confidence)
        assert r.p50_within_rank_tol, etype
        assert r.p90_within_rank_tol, etype
        assert r.p99_within_rank_tol, etype
        src = ev if etype == "ALL" else ev.filter(F.col("event_type") == etype)
        n = src.count()
        for q, v in [(0.5, r.p50), (0.9, r.p90), (0.99, r.p99)]:
            # the exact interpolated percentile sits at rank q (+ the
            # at-most-one-gap discretization slack)
            rank = src.filter(F.col("value") <= v).count() / n
            assert abs(rank - q) <= 0.03, (etype, q, v, rank)


def test_theta_retention_exact_at_fixture_scale(spark, sf_dir, qs):
    rows = qs["sketch_weekly_retention"](spark, sf_dir).collect()
    assert rows, "at least one consecutive-week pair expected"
    ev = read_table(spark, sf_dir, "events")
    wu = (
        ev.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("w"), "user_id"
        )
        .distinct()
        .collect()
    )
    by_week: dict = {}
    for r in wu:
        by_week.setdefault(r.w, set()).add(r.user_id)
    for r in rows:
        assert r.users_w == len(by_week[r.week_start])
        assert r.users_next == len(by_week[r.next_week_start])
        exact = len(by_week[r.week_start] & by_week[r.next_week_start])
        assert r.retained == exact  # exact mode below nominal entries
        assert r.retention_rate == pytest.approx(exact / r.users_w, abs=1e-6)
