"""Diagnose on-device normalize exactness vs the host IEEE formula.

`val_feed_bench` found uint8- and float32-fed decodes differ on the real
TPU (bit-identical on CPU).  A uint8 pixel has only 256 possible
normalized values; this probes, on the actual device:

  1. the current formula `(x/255 - 0.5)/0.5`
  2. fused variant `x * (2/255) - 1`
  3. a 256-entry exact lookup table (gather)

against host numpy fp32 bit patterns, plus the bf16 rounding of each
(what the model actually consumes).  Run on TPU: `python tools/normalize_exactness_probe.py`
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    x_u8 = np.arange(256, dtype=np.uint8)
    host = ((x_u8.astype(np.float32) / np.float32(255.0)) - np.float32(0.5)) / np.float32(0.5)
    host_bf16 = np.asarray(jnp.asarray(host).astype(jnp.bfloat16).astype(jnp.float32))

    table = jnp.asarray(host)  # host-exact values as a device constant

    @jax.jit
    def probe(x):
        cur = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        fused = x.astype(jnp.float32) * np.float32(2.0 / 255.0) - 1.0
        lut = table[x.astype(jnp.int32)]
        return cur, fused, lut

    cur, fused, lut = (np.asarray(o) for o in probe(jnp.asarray(x_u8)))
    for name, dev in (("current (x/255-.5)/.5", cur),
                      ("fused x*(2/255)-1", fused),
                      ("lut", lut)):
        f32_mism = np.flatnonzero(dev.view(np.uint32) != host.view(np.uint32))
        dev_bf16 = np.asarray(jnp.asarray(dev).astype(jnp.bfloat16).astype(jnp.float32))
        bf16_mism = np.flatnonzero(dev_bf16 != host_bf16)
        print(f"[{name:24s}] f32 mismatches: {len(f32_mism):3d}/256 "
              f"{f32_mism[:8].tolist()}  bf16 mismatches: {len(bf16_mism):3d}/256 "
              f"{bf16_mism[:8].tolist()}")
    print(f"platform={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
