"""Chip-side serving-kernel throughput: preprocess + decode in one jit.

The serving path (`OCRInference.predict_serving`) ships raw uint8
letterboxed pixels and runs resize-pad-normalize fused on the device
(`ops/preprocess.py`).  This measures the DEVICE side of that pipeline —
uint8 canvas in, tokens out — for the fastest configurations:

  attn  bf16        on-device preprocess + attention greedy decode
  ctc   int8-static on-device preprocess + CTC greedy (flagship serving)

Input transfer is excluded (resident uint8 batch): through this
environment's tunnel any end-to-end timing measures the ~15-40 MB/s link,
not the chip (PERF.md methodology); on production hosts the uint8 canvas
is exactly what crosses PCIe/DMA, 4x less than normalized fp32.

Usage:  python tools/serving_bench.py            # TPU
        JAX_PLATFORMS=cpu python tools/serving_bench.py --batch 8 \
            --width-mult 0.125 --hidden 32
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
    ap.add_argument("--width-mult", type=float, default=1.0)
    ap.add_argument("--hidden", type=int, default=256)
    args = ap.parse_args()

    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.ops.ctc import ctc_greedy_decode_jnp
    from rcnn_ocr_tpu.ops.preprocess import resize_pad_normalize

    B, img_h, img_w, max_len = args.batch, 32, 128, 25
    common = dict(
        num_classes=194, hidden_size=args.hidden, sos_id=1, eos_id=2, pad_id=0,
        blank_id=None, with_ctc_head=True, ctc_blank_id=0,
        width_mult=args.width_mult, dtype=jnp.bfloat16, use_pallas=False,
    )
    model = RCNN(**common)
    model_qs = RCNN(**common, quantize=True, act_quant="static")

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng},
        jnp.zeros((2, img_h, img_w, 3), jnp.float32),
        text=jnp.zeros((2, max_len + 1), jnp.int32),
        batch_max_length=max_len,
        method=model.init_all,
    )
    variables = jax.device_put(variables)

    # uint8 letterbox canvas: raw pixels at their original sizes, as the
    # host ships them (canvas == target size here: the common serving case)
    np_rng = np.random.default_rng(0)
    raw = jnp.asarray(
        np_rng.integers(0, 256, size=(B, img_h, img_w, 3), dtype=np.uint8)
    )
    sizes = jnp.asarray(
        np.stack(
            [np_rng.integers(16, img_h + 1, B), np_rng.integers(32, img_w + 1, B)],
            axis=1,
        ).astype(np.int32)
    )

    @jax.jit
    def serve_attn(variables, raw, sizes):
        x = resize_pad_normalize(raw, sizes, img_h, img_w)
        logits = model.apply(variables, x, train=False, batch_max_length=max_len)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def calibrate(variables, raw, sizes):
        x = resize_pad_normalize(raw, sizes, img_h, img_w)
        _, mutated = model_qs.apply(
            variables, x, train=False, method=model_qs.encode,
            mutable=["quant_stats"],
        )
        return mutated["quant_stats"]

    @jax.jit
    def serve_ctc_qs(variables, raw, sizes):
        x = resize_pad_normalize(raw, sizes, img_h, img_w)
        logits = model_qs.apply(variables, x, train=False, method=model_qs.ctc_logits)
        return ctc_greedy_decode_jnp(logits, 0)

    print(f"[serve] platform={jax.devices()[0].platform} batch={B}",
          file=sys.stderr)
    t_attn = _time_fn(serve_attn, variables, raw, sizes, iters=args.iters)
    print(f"[serve] preprocess+attn bf16        {t_attn * 1e3:8.2f} ms  "
          f"{B / t_attn:10,.0f} img/s", file=sys.stderr)
    v_qs = jax.device_put(
        {**variables, "quant_stats": _fetch(calibrate(variables, raw, sizes))}
    )
    t_ctc = _time_fn(serve_ctc_qs, v_qs, raw, sizes, iters=args.iters)
    print(f"[serve] preprocess+ctc int8-static  {t_ctc * 1e3:8.2f} ms  "
          f"{B / t_ctc:10,.0f} img/s", file=sys.stderr)


if __name__ == "__main__":
    main()
