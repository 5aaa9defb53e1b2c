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
    """Windowed step-time collector with percentile summaries.

    Timing each step individually requires a device sync per step, and on
    TPU (especially through a remote-dispatch tunnel) that round-trip
    serializes the async pipeline — the act of measuring slows training by
    tens of ms/step. Instead steps are timed in windows of ``window``
    dispatches with ONE sync at each boundary (``lap(sync)``); each sample
    is the mean step time of its window, percentiles are over window means.
    The first window absorbs compile/cache-load time and is dropped; later
    task-type first-compiles can still pollute single windows, so the
    throughput figure uses the (robust) p50, not the mean.
    """

    def __init__(self, window: int = 8, skip_windows: int = 1):
        self.window = max(1, int(window))
        self.skip_windows = int(skip_windows)
        self._times: List[float] = []
        self._laps = 0
        self._nwin = 0
        self._t0: Optional[float] = None
        self._tainted = False

    def lap(self, sync=None, taint: bool = False) -> None:
        """Called once per step with a zero-arg device-sync callable; only
        every ``window``-th call actually syncs and records. ``taint=True``
        marks the current window as compile-contaminated (first dispatch of
        a program) — it is timed but not recorded."""
        if taint:
            self._tainted = True
        self._laps += 1
        if self._laps % self.window:
            return
        if sync is not None:
            sync()
        now = time.perf_counter()
        if self._t0 is not None:
            self._nwin += 1
            if self._nwin > self.skip_windows and not self._tainted:
                self._times.append((now - self._t0) / self.window)
        self._t0 = now
        self._tainted = False

    def summary(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        out = {
            "steps": len(arr) * self.window,
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
        }
        if batch_size:
            out["images_per_sec"] = batch_size / out["p50_s"]
            out["p50_per_image_ms"] = out["p50_s"] / batch_size * 1e3
        return out

    def reset(self) -> None:
        self._times.clear()
        self._laps = 0
        self._nwin = 0
        self._t0 = None
