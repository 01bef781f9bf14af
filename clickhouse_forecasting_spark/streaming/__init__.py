from .rollup import daily_rollup_stream, streaming_daily_events

__all__ = ["daily_rollup_stream", "streaming_daily_events"]
