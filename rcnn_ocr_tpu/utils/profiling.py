"""Profiling / tracing hooks.

The reference had none (SURVEY.md §5.1 — progress bars only); a serving-
grade TPU stack needs both a step timer (images/sec, step-time percentiles)
and XLA-level traces.  `trace` wraps `jax.profiler.trace` (view with
TensorBoard's profile plugin or xprof); `StepTimer` is a cheap host-side
ring buffer the training loop feeds every step.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture an XLA profiler trace into ``log_dir`` (no-op when disabled)."""
    if not enabled:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
    except Exception:  # profiler backend unavailable (e.g. remote tunnel)
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


class StepTimer:
    """Rolling step-time statistics (mean / p50 / p95, images/sec)."""

    def __init__(self, window: int = 200):
        self.window = window
        self._times: list = []
        self._images: list = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self, n_images: int = 0) -> float:
        if self._last is None:
            return 0.0
        dt = time.perf_counter() - self._last
        self._last = None
        self._times.append(dt)
        self._images.append(n_images)
        if len(self._times) > self.window:
            self._times.pop(0)
            self._images.pop(0)
        return dt

    @property
    def count(self) -> int:
        return len(self._times)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        t = np.asarray(self._times)
        imgs = float(np.sum(self._images))
        return {
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "images_per_sec": imgs / float(t.sum()) if t.sum() > 0 else 0.0,
        }
