"""Observability: step timers, metrics logging, jax.profiler traces.

The reference has no tracing/profiling (SURVEY.md §5); these are first-class
here: JSONL metrics (TensorBoard/CSV logger parity), per-stage wall-clock,
and a context manager around jax.profiler for TPU trace capture.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class StepTimer:
    """`with timer:` around a step; .last holds seconds (device-synced by the
    caller blocking on outputs)."""

    def __init__(self):
        self.last = 0.0
        self.total = 0.0
        self.count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last = time.perf_counter() - self._t0
        self.total += self.last
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


class MetricsLogger:
    """Append-only JSONL metrics + TensorBoard event file (the reference's
    TB/CSV logger pair, launch.py:212-227). TB events are written by the
    dependency-free writer (utils/tb_writer.py) into ``tb_dir`` (defaults to
    ``<dir of path>/tb``; pass tb_dir="" to disable)."""

    def __init__(self, path: str, tb_dir: Optional[str] = None):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if tb_dir is None:
            tb_dir = os.path.join(os.path.dirname(path) or ".", "tb")
        self._tb = None
        if tb_dir:
            from animate3d_tpu.utils.tb_writer import TBWriter

            self._tb = TBWriter(tb_dir)

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": step}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.scalars(metrics, step)
            self._tb.flush()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace capture when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
