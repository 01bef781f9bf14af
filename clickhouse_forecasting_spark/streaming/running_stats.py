"""Stateful per-key running statistics on the Spark 4 transformWithState
API (the successor to applyInPandasWithState; SURVEY §7.4 extension).

Maintains per-user running (count, sum, min, max) over the event stream
using a typed ValueState handle — the modern stateful-processor shape:
state is explicit and queryable, TTL-able, and the processor composes with
timers. Paired with sessionize.py (the applyInPandasWithState form) the
engine demonstrates both stateful APIs.

Scale: state is 4 scalars per user partitioned across the cluster;
micro-batches deliver Arrow record batches per key.

Runtime dependency: the transformWithState state-server protocol speaks
protobuf — ``google.protobuf`` must be importable in the Python workers
(it ships with any real PySpark deployment; environments without it should
use streaming/sessionize.py, the applyInPandasWithState twin, which has no
extra deps). ``HAVE_TWS_DEPS`` reports availability.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

try:  # pragma: no cover - environment probe
    from google import protobuf  # noqa: F401

    HAVE_TWS_DEPS = True
except Exception:  # pragma: no cover
    HAVE_TWS_DEPS = False

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        n, s, mn, mx = (self._state.get() or (0, 0.0, None, None)) if self._state.exists() else (0, 0.0, None, None)
        for pdf in rows:
            vals = pdf["value"].astype(float)
            n += int(len(vals))
            s += float(vals.sum())
            bmn, bmx = float(vals.min()), float(vals.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        self._state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [s],
                "min_value": [mn],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_stats_stream(events: DataFrame) -> DataFrame:
    """Per-user running stats over a stream of (user_id, value)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
