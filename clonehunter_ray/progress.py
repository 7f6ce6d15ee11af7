"""Per-stage progress reporting — the Ray-side analogue of the
reference's tqdm pipeline bar (core/logging.py:1-16 get_logger;
core/pipeline.py:97-133 wraps each stage iterable in a labelled tqdm).

A streaming Ray Data plan has no driver-side iterable to wrap: stages
execute as fused operators across the cluster, and Ray Data already
renders its own per-operator progress bars when
``DataContext.enable_progress_bars`` is on. What the reference's bar
adds on top is a per-STAGE summary line (label, item count, rate) on
the driver — this module reproduces exactly that: ``stage_progress``
brackets a pipeline stage and logs ``[INFO] <label>: N rows in S s
(R rows/s)`` through a logger configured like the reference's.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

LOGGER_NAME = "clonehunter_ray"


def get_logger() -> logging.Logger:
    """Reference-parity logger (core/logging.py:8-16): stream handler,
    ``[LEVEL] message`` format, INFO level, installed once."""
    logger = logging.getLogger(LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


def log_stage(label: str, seconds: float, rows: int | None = None) -> None:
    """The one implementation of the per-stage summary line — used by
    ``stage_progress`` on exit and called directly by ``scan()`` for
    stages whose wall time is measured externally (checkpoint wrappers,
    streamed/fused stages)."""
    if rows is None:
        get_logger().info("%s: done in %.2fs", label, seconds)
    else:
        rate = rows / seconds if seconds > 0 else float("inf")
        get_logger().info(
            "%s: %d rows in %.2fs (%.0f rows/s)", label, rows, seconds, rate
        )


@contextmanager
def stage_progress(label: str, enabled: bool = True):
    """Bracket one pipeline stage; on exit, log its wall time and —
    when the caller reports one via ``set_rows`` — row count and rate.

    Usage::

        with stage_progress("Build signatures") as p:
            ds = ...
            p.set_rows(ds.count())
    """

    class _Handle:
        rows: int | None = None

        def set_rows(self, n: int) -> None:
            self.rows = int(n)

    h = _Handle()
    t0 = time.monotonic()
    if enabled:
        get_logger().info("%s ...", label)
    try:
        yield h
    finally:
        if enabled:
            log_stage(label, time.monotonic() - t0, h.rows)
