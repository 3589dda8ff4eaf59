"""Stem optimization experiments (VERDICT round-1 item #7).

PERF.md isolates the backbone stem (conv3x3 3->64, conv3x3 64->128,
maxpool2) at ~15.2 ms per 2048-batch vs a ~10 ms roofline.  The suspects:
the C=3 first conv (contraction dim 27, heavily padded on the MXU) and the
maxpool's extra HBM round-trip over the 32x128x128 stem1 output.

This script measures, in ONE process (remote compiles are ~2-5 min each):

  V0   current stem (stem0 -> stem1 -> maxpool), plus a per-piece breakdown
  V1   space-to-depth stem0: pad->s2d (32x128x3 -> 17x65x12) -> conv2x2
       (12->256, the EXACT algebraic rewrite of conv3x3 pad1) -> depth-to-
       space -> stem1 -> pool.  Raises stem0's MXU contraction from 27 to 48
       and quarters the position count.
  V2   V1 + "offset-conv" stem1/pool fusion: stem1 computed as four
       stride-2 convs (one per output parity), maxpool folded into an
       elementwise max of the four — the full-res 32x128x128 stem1 output
       is never materialized in HBM.

V1's kernel rewrite is exact (extra taps are zeros); the script asserts
V0 == V1 == V2 numerics on-device before timing.

Usage:  python tools/stem_experiments.py            # TPU (default platform)
        JAX_PLATFORMS=cpu python tools/stem_experiments.py --batch 8
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), out)


def _time_fn(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def conv(x, k, strides=(1, 1), padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def bn_relu(x, scale, shift):
    return jnp.maximum(x * scale + shift, 0.0)


def s2d_kernel(k):
    """conv3x3-pad1 kernel [3,3,C,F] -> space-to-depth conv2x2 kernel
    [2,2,4C,4F] over block-2 s2d input (exact rewrite; unused taps zero).

    Output channel (dp*2+dq)*F+o holds the original output at row parity dp,
    col parity dq; input channel (sr*2+sc)*C+c holds the padded input at
    parities (sr, sc).
    """
    kh, kw, c, f = k.shape
    assert (kh, kw) == (3, 3)
    ks = np.zeros((2, 2, 4 * c, 4 * f), np.float32)
    for dp in range(2):
        for dq in range(2):
            for u in range(3):
                for v in range(3):
                    a, sr = divmod(dp + u, 2)
                    b, sc = divmod(dq + v, 2)
                    ks[a, b, (sr * 2 + sc) * c:(sr * 2 + sc + 1) * c,
                       (dp * 2 + dq) * f:(dp * 2 + dq + 1) * f] = k[u, v]
    return jnp.asarray(ks)


def space_to_depth_pad1(x):
    """[B,H,W,C] -> pad1 -> [B,(H+2)/2,(W+2)/2,4C] block-2 s2d."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(b, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (h + 2) // 2, (w + 2) // 2, 4 * c)


def depth_to_space(y):
    """[B,H,W,4F] (parity-major groups) -> [B,2H,2W,F]."""
    b, h, w, c4 = y.shape
    f = c4 // 4
    y = y.reshape(b, h, w, 2, 2, f).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-numerics", action="store_true",
                    help="skip the full-output equivalence check (3 compiles)")
    args = ap.parse_args()

    B, H, W = args.batch, 32, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    dt = jnp.bfloat16

    k0 = jnp.asarray((rng.normal(size=(3, 3, 3, 64)) * 0.1).astype(np.float32))
    k1 = jnp.asarray((rng.normal(size=(3, 3, 64, 128)) * 0.05).astype(np.float32))
    s0 = jnp.asarray((1 + 0.1 * rng.normal(size=64)).astype(np.float32))
    b0 = jnp.asarray((0.1 * rng.normal(size=64)).astype(np.float32))
    s1 = jnp.asarray((1 + 0.1 * rng.normal(size=128)).astype(np.float32))
    b1 = jnp.asarray((0.1 * rng.normal(size=128)).astype(np.float32))
    k0s = s2d_kernel(np.asarray(k0))
    # s2d BN params: channel group (dp*2+dq)*F+o shares the original o stats
    s0s, b0s = jnp.tile(s0, 4), jnp.tile(b0, 4)

    def stem0(x):
        y = conv(x.astype(dt), k0.astype(dt), padding=((1, 1), (1, 1)))
        return bn_relu(y.astype(jnp.float32), s0, b0).astype(dt)

    def stem1(y):
        y = conv(y.astype(dt), k1.astype(dt), padding=((1, 1), (1, 1)))
        return bn_relu(y.astype(jnp.float32), s1, b1).astype(dt)

    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    # Timed variants return a SCALAR: this remote platform eagerly downloads
    # every call's outputs through the tunnel, so returning the full feature
    # map times the ~GB transfer, not the compute (first-run lesson: stem0
    # "took" 4.6 s == its 1.07 GB output at tunnel bandwidth).  The reduction
    # sits behind relu/max so XLA cannot algebraically skip the convs.
    def v0_full(x):
        return pool(stem1(stem0(x)))

    @jax.jit
    def v0(x):
        return jnp.sum(v0_full(x).astype(jnp.float32))

    @jax.jit
    def v0_stem0(x):
        return jnp.sum(stem0(x).astype(jnp.float32))

    @jax.jit
    def v0_stem1(y):
        return jnp.sum(stem1(y).astype(jnp.float32))

    @jax.jit
    def v0_pool(y):
        return jnp.sum(pool(y).astype(jnp.float32))

    def stem0_s2d(x):
        xs = space_to_depth_pad1(x.astype(dt))          # [B,17,65,12]
        ys = conv(xs, k0s.astype(dt))                   # [B,16,64,256]
        return bn_relu(ys.astype(jnp.float32), s0s, b0s).astype(dt)

    def v1_full(x):
        return pool(stem1(depth_to_space(stem0_s2d(x))))

    @jax.jit
    def v1(x):
        return jnp.sum(v1_full(x).astype(jnp.float32))

    def v2_full(x):
        ys = stem0_s2d(x)
        y0p = jnp.pad(depth_to_space(ys), ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = []
        for dp in range(2):
            for dq in range(2):
                yo = conv(
                    y0p[:, dp:dp + 33, dq:dq + 129].astype(dt),
                    k1.astype(dt), strides=(2, 2))
                outs.append(bn_relu(yo.astype(jnp.float32), s1, b1))
        return jnp.maximum(
            jnp.maximum(outs[0], outs[1]), jnp.maximum(outs[2], outs[3])
        ).astype(dt)

    @jax.jit
    def v2(x):
        return jnp.sum(v2_full(x).astype(jnp.float32))

    print(f"[stem] platform={jax.devices()[0].platform} batch={B}",
          file=sys.stderr)

    if not args.skip_numerics:
        # numerics (bf16: expect tiny reduction-order deltas only).  Verified
        # on the real chip 2026-08-16 (exact-mismatch ~0.36, allclose 2e-2);
        # --skip-numerics avoids 3 extra remote compiles on re-runs.
        jv0, jv1, jv2 = jax.jit(v0_full), jax.jit(v1_full), jax.jit(v2_full)
        r0, r1, r2 = _fetch(jv0(x)), _fetch(jv1(x)), _fetch(jv2(x))
        for name, r in (("v1", r1), ("v2", r2)):
            np.testing.assert_allclose(
                r0.astype(np.float32), r.astype(np.float32), rtol=2e-2, atol=2e-2)
            mism = np.mean(r0 != r)
            print(f"[stem] {name} numerics vs v0: OK (exact-mismatch rate {mism:.2e})",
                  file=sys.stderr)

    # stage inputs for the breakdown timings (built on device, fetched once)
    @jax.jit
    def gen_inputs(x):
        y0 = stem0(x)
        return y0, stem1(y0)

    # dispatch-floor calibration: a near-empty program isolates the remote
    # per-call overhead (tunnel RTT) from actual device compute
    @jax.jit
    def nullop(x):
        return jnp.sum(x[0, 0, 0])

    y0, y1 = gen_inputs(x)
    t_null = _time_fn(nullop, x, iters=args.iters)
    print(f"[stem] dispatch floor (null op): {t_null * 1e3:8.2f} ms",
          file=sys.stderr)
    t_stem0 = _time_fn(v0_stem0, x, iters=args.iters)
    t_stem1 = _time_fn(v0_stem1, y0, iters=args.iters)
    t_pool = _time_fn(v0_pool, y1, iters=args.iters)
    t_v0 = _time_fn(v0, x, iters=args.iters)
    t_v1 = _time_fn(v1, x, iters=args.iters)
    t_v2 = _time_fn(v2, x, iters=args.iters)

    ms = lambda t: f"{t * 1e3:8.2f} ms"
    print(f"[stem] breakdown: stem0 {ms(t_stem0)}  stem1 {ms(t_stem1)}  "
          f"pool {ms(t_pool)}  (sum {ms(t_stem0 + t_stem1 + t_pool)})",
          file=sys.stderr)
    for name, t in (("v0 current", t_v0), ("v1 s2d-stem0", t_v1),
                    ("v2 s2d+offset-fused-pool", t_v2)):
        print(f"[stem] {name:26s} {ms(t)}   {B / t:10,.0f} img/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
