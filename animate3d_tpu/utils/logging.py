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


class ProgressWriter:
    """Single-line progress file for UI front-ends (reference gradio mode:
    threestudio/utils/callbacks.py:121-156 ProgressCallback — the file is
    rewritten in place, not appended, so a poller reads one current line)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = None

    def write(self, msg: str) -> None:
        if self._f is None:
            self._f = open(self.path, "w")
        self._f.seek(0)
        self._f.truncate()
        self._f.write(msg)
        self._f.flush()

    def train_step(self, step: int, max_steps: int) -> None:
        self.write(f"Generation progress: {step / max(max_steps, 1) * 100:.2f}%")

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


class WandbLogger:
    """Optional Weights & Biases logging (reference train.py:177-178,610-611
    gates on ``use_wandb``). When the wandb package is missing (this image
    has no egress) it degrades to an offline JSONL file next to the metrics
    log so the call sites stay identical."""

    def __init__(self, project: str, name: str, config: Optional[Dict] = None,
                 offline_path: Optional[str] = None):
        self._run = None
        self._offline = None
        try:
            import wandb  # noqa: F401 — optional dependency

            self._run = wandb.init(project=project, name=name, config=config)
        except Exception as e:  # module missing or init failed (no egress)
            self._offline = offline_path or "wandb_offline.jsonl"
            os.makedirs(os.path.dirname(self._offline) or ".", exist_ok=True)
            with open(self._offline, "a") as f:
                f.write(json.dumps({"event": "init", "project": project,
                                    "name": name,
                                    "reason": f"wandb unavailable: {e}"}) + "\n")

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)
            return
        rec = {"step": step}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        with open(self._offline, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
