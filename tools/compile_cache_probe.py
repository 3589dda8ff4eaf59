"""Probe: does JAX's persistent compilation cache cut TPU cold starts?

Serving cold start on this platform is dominated by the remote XLA
compile (~19-29 s at production shape, PERF.md round 3).  If
``jax_compilation_cache_dir`` works through the remote-compile tunnel,
a serving host restart could skip the compile entirely.

Run TWICE in separate processes; the second run hits the cache if the
platform supports it:

    python tools/compile_cache_probe.py --cache-dir /tmp/jaxcache
    python tools/compile_cache_probe.py --cache-dir /tmp/jaxcache

Prints one JSON line: {"compile_s": ..., "steady_ms": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    # a conv stack heavy enough that compile time is clearly visible
    @jax.jit
    def f(x, k1, k2, k3):
        for k in (k1, k2, k3):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x)
        return jnp.max(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, 32, 128, 64)), jnp.bfloat16)
    ks = [
        jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
        for _ in range(3)
    ]

    t0 = time.perf_counter()
    out = f(x, *ks)
    _ = np.asarray(out)  # block_until_ready is a no-op on this platform
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(f(x, *ks))
    steady_ms = (time.perf_counter() - t0) / 3 * 1e3

    cached_files = 0
    if os.path.isdir(args.cache_dir):
        cached_files = sum(len(fs) for _, _, fs in os.walk(args.cache_dir))
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "compile_s": round(compile_s, 2),
        "steady_ms": round(steady_ms, 2),
        "cache_files": cached_files,
    }))


if __name__ == "__main__":
    main()
