"""Shared timing helpers for the tools/ benchmark scripts.

Centralizes the remote-platform timing methodology (see PERF.md): a real
device->host fetch forces completion (block_until_ready is a no-op on the
tunneled TPU platform), and callers subtract a null-op dispatch floor for
sub-10 ms kernels.  bench.py keeps its own copy so the driver-run benchmark
stays single-file.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def fetch(out):
    """Force completion with a real device->host transfer."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), out)


def time_fn(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Mean seconds per call over ``iters`` calls, after ``warmup``."""
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters
