"""Observability parity (SURVEY §2.5, O1-O3).

The reference's only outputs besides tables are a rotating file log
(forecast.log, 50 MB x 3 backups, forecast_script.py:58-64), an uncaught-
exception hook (:75-79), and run-summary counters (:69-73,244-247).

Deviations (documented, SURVEY §2.5/O3): the reference double-counts a table
with failed columns in both failed and successful lists (:197,:217) and its
summary arithmetic `len(skipped)-len(failed)` can go negative (:246). We keep
the counters disjoint and report plain counts.
"""

from __future__ import annotations

import logging
import sys
import time
from dataclasses import dataclass, field
from logging.handlers import RotatingFileHandler

LOG_FORMAT = "[%(asctime)s] [%(levelname)s]: %(message)s"
LOG_DATEFMT = "%d.%m.%Y %H:%M:%S"


def configure_logging(log_path: str = "forecast.log", level: int = logging.INFO) -> logging.Logger:
    """O1: rotating file log, 50 MB max, 3 backups (forecast_script.py:59-61).

    Idempotent: repeated calls (multiple runs in one process, tests) must
    not stack handlers, or every record is written once per call."""
    logger = logging.getLogger("clickhouse_forecasting_spark")
    logger.setLevel(level)
    already = any(
        isinstance(h, RotatingFileHandler) and h.baseFilename.endswith(log_path)
        for h in logger.handlers
    )
    if not already:
        handler = RotatingFileHandler(log_path, maxBytes=50 * 1024 * 1024, backupCount=3)
        handler.setFormatter(logging.Formatter(LOG_FORMAT, datefmt=LOG_DATEFMT))
        logger.addHandler(handler)
    return logger


def install_excepthook(logger: logging.Logger) -> None:
    """O2: log uncaught exceptions, then delegate (forecast_script.py:75-79)."""

    def _hook(exc_type, exc_value, exc_tb):
        logger.error("uncaught error during run:", exc_info=(exc_type, exc_value, exc_tb))
        sys.__excepthook__(exc_type, exc_value, exc_tb)

    sys.excepthook = _hook


@dataclass
class RunCounters:
    """O3: run summary (forecast_script.py:69-73,244-247), disjoint sets."""

    successful: list[str] = field(default_factory=list)
    new: list[str] = field(default_factory=list)
    updated: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    failed: list[str] = field(default_factory=list)
    failed_metrics: dict[str, list[str]] = field(default_factory=dict)
    start_time: float = field(default_factory=time.time)

    def summary(self) -> str:
        duration = time.time() - self.start_time
        return (
            f"run complete in {duration:.2f}s — "
            f"successful: {len(self.successful)}, new: {len(self.new)}, "
            f"updated: {len(self.updated)}, skipped: {len(self.skipped)}, "
            f"failed: {len(self.failed)}"
        )
