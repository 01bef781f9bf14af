"""Composite operators Spark lacks natively, built scale-first from
DataFrame primitives (SURVEY §7.4 / task brief: as-of join, range ops)."""

from .asof import asof_join  # noqa: F401
from .diff import diff_summary, snapshot_diff  # noqa: F401
from .incremental import maintain_daily_rollup, merge_additive  # noqa: F401
from .range_join import range_join_points  # noqa: F401
from .ranking import (  # noqa: F401
    global_ntile,
    global_rank,
    global_row_number,
    global_running_max,
    global_running_sum,
    partitioned_run_counts,
    top_k,
)
from .zorder import write_zordered, zorder_key  # noqa: F401
