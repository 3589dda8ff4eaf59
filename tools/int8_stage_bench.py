"""Per-stage timing of the int8-static backbone (real model blocks).

tools/int8_microbench.py shows the bare int8 conv at ~352 TOP/s — near the
v5e nominal peak — while the full int8-static path achieves ~203 TOP/s
effective.  This times each backbone stage IN ISOLATION (its input
resident on device, scalar-reduced output) using the actual `ConvBN` /
`SEBasicBlock` modules, so the dequant-BN-ReLU-SE-requant epilogues are
exactly the production ones.  Comparing each stage against its conv-only
speed-of-light shows where the missing time goes.

Scales in `quant_stats` are set to 1.0 — timing is scale-invariant.

Usage:  python tools/int8_stage_bench.py [--batch 2048]
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

    import flax.linen as nn

    from rcnn_ocr_tpu.models.seresnet31 import ConvBN, SEBasicBlock

    B = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.relu(ConvBN(64, dtype=dt, name="stem0")(x, train))
            x = nn.relu(ConvBN(128, dtype=dt, name="stem1")(x, train))
            return nn.max_pool(x, (2, 2), strides=(2, 2))

    class Blocks(nn.Module):
        features: int
        blocks: int
        stride: int

        @nn.compact
        def __call__(self, x, train=False):
            for bi in range(self.blocks):
                x = SEBasicBlock(
                    self.features,
                    stride=self.stride if bi == 0 else 1,
                    quantize=True,
                    act_quant="static",
                    dtype=dt,
                    name=f"b{bi}",
                )(x, train)
            return x

    class OutHead(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.relu(
                ConvBN(512, kernel=(2, 2), strides=(2, 1),
                       padding=((0, 0), (1, 1)), dtype=dt, quantize=True,
                       act_quant="static", name="out0")(x, train)
            )
            return nn.relu(
                ConvBN(512, kernel=(2, 2), strides=(1, 1), padding="VALID",
                       dtype=dt, quantize=True, act_quant="static",
                       name="out1")(x, train)
            )

    # (name, module, input shape, int8 GMAC/img for SoL at 352 TOP/s)
    stages = [
        ("stem (bf16)", Stem(), (B, 32, 128, 3), 0.0),
        ("layer1", Blocks(256, 1, 2), (B, 16, 64, 128), 0.235),
        ("layer2", Blocks(256, 2, 1), (B, 8, 32, 256), 0.604),
        ("layer3", Blocks(512, 5, 2), (B, 8, 32, 256), 1.436),
        ("layer4", Blocks(512, 3, 1), (B, 4, 16, 512), 0.906),
        ("out head", OutHead(), (B, 4, 16, 512), 0.150),
    ]

    @jax.jit
    def nullop(x):
        return jnp.max(x[:8, 0])

    xnull = jnp.zeros((64, 8), jnp.float32)
    t_null = _time_fn(nullop, xnull, iters=args.iters)
    print(f"[stage] platform={jax.devices()[0].platform} batch={B}  "
          f"dispatch floor {t_null * 1e3:.2f} ms", file=sys.stderr)

    total = 0.0
    for name, mod, shape, gmac in stages:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)
        v = mod.init({"params": key}, x[:2])
        if "quant_stats" in v:
            v = dict(v)
            v["quant_stats"] = jax.tree_util.tree_map(
                lambda s: jnp.ones_like(s), v["quant_stats"]
            )

        @jax.jit
        def run(v, x, mod=mod):
            return jnp.sum(jnp.maximum(mod.apply(v, x), 0).astype(jnp.float32))

        t = max(_time_fn(run, v, x, iters=args.iters) - t_null, 1e-9)
        total += t
        # SoL ms = (gmac·1e9 MAC/img · 2 op/MAC · B img) / 352e12 op/s · 1e3
        sol_ms = gmac * 2 * B / 352.0 if gmac else float("nan")
        print(f"[stage] {name:12s} {t * 1e3:7.2f} ms   "
              f"SoL(conv@352TOPs) {sol_ms:6.2f} ms", file=sys.stderr)
    print(f"[stage] sum {total * 1e3:7.2f} ms (net of floor)", file=sys.stderr)


if __name__ == "__main__":
    main()
