"""Semantic invariant for the batch-24 query (rebased revenue index).
Cross-engine value equality is covered by the DuckDB oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from clickhouse_forecasting_spark.sources import read_table


def test_rebased_index_first_month_is_unity(spark, sf_dir):
    qs = entry.queries()
    rows = qs["rebased_revenue_index"](spark, sf_dir).collect()
    assert rows
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    for region, rs in by_region.items():
        rs.sort(key=lambda r: r.mo)
        base = rs[0].cents
        assert rs[0].index_ppm == 1_000_000
        for r in rs:
            assert r.index_ppm == (r.cents * 1_000_000) // base
