"""Profiling and step-timing instrumentation.

The reference's only timing signal is wall-clock epoch time
(reference train.py:567,586,670; SURVEY.md §5 'Tracing/profiling: none').
Here:

  * ``ProfileTrace``: config-driven jax.profiler trace window (viewable in
    TensorBoard / xprof) around a chosen step range.
  * ``StepTimer``: host-side per-step wall times with throughput and
    percentile summaries (p50/p90/p99) — feeds images/sec and the p50
    per-image latency tracked by BASELINE.md.

Config keys (all optional):
  training.profile.enabled: bool
  training.profile.dir: str (default <output_dir>/profile)
  training.profile.start_step / stop_step: ints
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np


class ProfileTrace:
    """Start/stop a jax.profiler trace across a step window."""

    def __init__(self, config, default_dir: str):
        prof = config.get("training.profile", {}) or {}
        self.enabled = bool(prof.get("enabled", False))
        self.trace_dir = str(prof.get("dir", default_dir))
        self.start_step = int(prof.get("start_step", 5))
        self.stop_step = int(prof.get("stop_step", 15))
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.enabled and not self._active and step == self.start_step:
            import jax

            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_step:
            import jax

            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Per-step wall-time collector with percentile summaries."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._count += 1
        if self._count > self.skip_first:  # drop compile steps
            self._times.append(dt)

    def summary(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        out = {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
        }
        if batch_size:
            out["images_per_sec"] = batch_size / out["mean_s"]
            out["p50_per_image_ms"] = out["p50_s"] / batch_size * 1e3
        return out

    def reset(self) -> None:
        self._times.clear()
        self._count = 0
