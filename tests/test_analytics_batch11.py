"""Semantic invariants for the batch-11 financial/signal queries
(Bollinger bands, max drawdown, Haar wavelets). Cross-engine value
equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


@pytest.fixture(scope="module")
def daily_cents(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x"))
        .orderBy("d")
        .collect()
    )
    return [(r.d, r.x) for r in rows]


def test_bollinger_matches_python_window(spark, sf_dir, qs, daily_cents):
    got = {r.d: r for r in qs["bollinger_bands_daily"](spark, sf_dir).collect()}
    assert len(got) == len(daily_cents)
    xs = [x for _, x in daily_cents]
    for t, (d, x) in enumerate(daily_cents):
        frame = xs[max(0, t - 19) : t + 1]
        n = len(frame)
        mean = sum(frame) / n
        var = sum(v * v for v in frame) / n - mean * mean
        sigma = max(var, 0.0) ** 0.5
        r = got[d]
        assert r.x == x
        assert r.ma20 == pytest.approx(mean, abs=0.02)
        assert r.band_lo == pytest.approx(mean - 2 * sigma, abs=0.02)
        assert r.band_hi == pytest.approx(mean + 2 * sigma, abs=0.02)
        assert r.band_lo <= r.ma20 <= r.band_hi


def test_max_drawdown_matches_python_scan(spark, sf_dir, qs, daily_cents):
    row = qs["max_drawdown_daily"](spark, sf_dir).collect()[0]
    xs = [x for _, x in daily_cents]
    n, total = len(xs), sum(xs)
    equity, peak, best = [], -(10**30), (None, -1)
    p = 0
    for i, ((d, x)) in enumerate(daily_cents, start=1):
        p += x
        e = n * p - i * total
        peak = max(peak, e)
        dd = peak - e
        if dd > best[1]:
            best = (d, dd)
    assert row.d == best[0]
    assert row.drawdown == best[1]
    assert row.peak - row.equity == row.drawdown


def test_haar_details_match_python_transform(spark, sf_dir, qs, daily_cents):
    rows = qs["haar_wavelet_daily"](spark, sf_dir).collect()
    xs = [x for _, x in daily_cents]
    level_details = {}
    cur = xs
    for lvl in (1, 2, 3):
        details = {}
        approx = []
        for i in range(len(cur) // 2):
            a, b = cur[2 * i], cur[2 * i + 1]
            details[i] = a - b
            approx.append(a + b)
        level_details[lvl] = details
        cur = approx
    by_level: dict[int, list] = {}
    for r in rows:
        by_level.setdefault(r.level, []).append(r)
    assert set(by_level) == {1, 2, 3}
    for lvl, rs in by_level.items():
        assert len(rs) == 5
        exp_top = sorted(
            level_details[lvl].items(), key=lambda kv: (-abs(kv[1]), kv[0])
        )[:5]
        got = sorted(
            ((r.pair_idx, r.detail) for r in rs),
            key=lambda kv: (-abs(kv[1]), kv[0]),
        )
        assert got == exp_top
