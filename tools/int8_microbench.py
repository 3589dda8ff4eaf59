"""int8 MXU rate: conv lowering vs raw matmul vs im2col rewrite.

The int8-static path measures ~203 TOP/s on the layer3 conv shapes — about
half the v5e's nominal int8 peak.  Is that the conv *lowering* or the
hardware rate at these shapes?  This times, on one chip:

  matmul   int8 dot_general at the layer3-equivalent GEMM shape
           (M = B·4·16 positions, K = 9·512 taps, N = 512)
  conv     int8 conv_general_dilated 3x3 @ 4x16x512 (the layer3 block op)
  im2col   the same conv as 9 shifted int8 slices -> one int8 matmul

If matmul >> conv, rewriting the hot convs as im2col GEMMs is the next
headline lever; if they match, 203 TOP/s IS the achievable rate here and
the int8 path is at speed-of-light.

Usage:  python tools/int8_microbench.py [--batch 2048]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _bench_util import fetch as _fetch, time_fn as _time_fn  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    B, H, W, C = args.batch, 4, 16, 512
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 128, size=(B, H, W, C), dtype=np.int8))
    k8 = jnp.asarray(rng.integers(-127, 128, size=(3, 3, C, C), dtype=np.int8))
    m8 = jnp.asarray(
        rng.integers(-127, 128, size=(B * H * W, 9 * C), dtype=np.int8)
    )
    w8 = jnp.asarray(rng.integers(-127, 128, size=(9 * C, C), dtype=np.int8))

    # every variant reduces to ONE scalar: the remote platform downloads all
    # outputs, and int32 feature maps at these sizes would time the tunnel
    @jax.jit
    def conv(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return jnp.max(jnp.abs(y))

    @jax.jit
    def matmul(m, w):
        y = jax.lax.dot_general(
            m, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.max(jnp.abs(y))

    @jax.jit
    def im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            jax.lax.dynamic_slice(xp, (0, dh, dw, 0), (B, H, W, C))
            for dh in range(3)
            for dw in range(3)
        ]
        m = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * C)
        y = jax.lax.dot_general(
            m, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.max(jnp.abs(y))

    tops = 2.0 * B * H * W * 9 * C * C  # identical op count for all three

    @jax.jit
    def nullop(x):
        return jnp.max(x[0, 0, 0, :8].astype(jnp.int32))

    print(f"[int8] platform={jax.devices()[0].platform} batch={B} "
          f"shape {H}x{W}x{C} 3x3 ({tops / 1e12:.1f} TOP)", file=sys.stderr)
    t_null = _time_fn(nullop, x8, iters=args.iters)
    print(f"[int8] dispatch floor {t_null * 1e3:7.2f} ms", file=sys.stderr)
    for name, fn, a in (
        ("conv  ", conv, (x8, k8)),
        ("matmul", matmul, (m8, w8)),
        ("im2col", im2col, (x8, w8)),
    ):
        t = _time_fn(fn, *a, iters=args.iters)
        te = max(t - t_null, 1e-9)
        print(f"[int8] {name} {t * 1e3:7.2f} ms  ({te * 1e3:6.2f} net)  "
              f"{tops / te / 1e12:7.1f} TOP/s", file=sys.stderr)


if __name__ == "__main__":
    main()
