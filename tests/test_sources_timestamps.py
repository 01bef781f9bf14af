"""read_table timestamp normalization: every fixture generation of
events.ts (TIMESTAMP(NANOS) -> int64-under-nanosAsLong, and
TIMESTAMP(MICROS) without isAdjustedToUTC -> TIMESTAMP_NTZ) must land on
plain TimestampType so event-time operators (unix_micros, windows,
watermarks) resolve.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_forecasting_spark.sources import read_table


def test_fixture_events_ts_is_timestamp(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    # the event-time surface resolves and is monotone with event ids
    row = ev.select(F.min(F.unix_micros("ts")).alias("lo"),
                    F.max(F.unix_micros("ts")).alias("hi")).collect()[0]
    assert row.lo < row.hi


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_synthetic_units_normalize(spark, tmp_path, unit):
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00.123456", "2024-06-15 12:34:56.654321"]
    )
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
        }
    )
    d = tmp_path / unit
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    df = read_table(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(r.us for r in df.select(F.unix_micros("ts").alias("us")).collect())
    expect = sorted(int(t.value) // 1000 for t in ts)  # ns -> µs
    assert got == expect
