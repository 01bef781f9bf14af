from .dedup_stream import dedup_stream, dedup_stream_exact
from .rollup import daily_rollup_stream, streaming_daily_events

__all__ = [
    "daily_rollup_stream",
    "dedup_stream",
    "dedup_stream_exact",
    "streaming_daily_events",
]
