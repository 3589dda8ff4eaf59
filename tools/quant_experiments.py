"""int8-static stem quantization experiment (round 2).

Round 1's negative result — "quantizing the stem makes the CNN slower" —
was measured on the DYNAMIC int8 path, where the cost is the per-call
abs-max reduction over the large early activations (32x128 resolution).
The static-calibrated path has no abs-max pass at all: the quantize step
is elementwise and fuses into the producer epilogue.  That removes the
exact cost that killed the stem, so it must be re-measured.

Measures, in ONE process (remote compiles are ~2-5 min each):

  bf16          full-precision reference path (decode-agreement oracle)
  static        int8-static, stem bf16 (the current bench headline)
  static+stem   int8-static including stem0 (C=3) + stem1 (64->128)

For each int8 variant: calibrate on the timing batch, report img/s and
the greedy-token agreement rate vs bf16 (random weights — near-zero
logit margins, so agreement here lower-bounds trained-model agreement).

Usage:  python tools/quant_experiments.py             # TPU
        JAX_PLATFORMS=cpu python tools/quant_experiments.py --batch 8
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
    ap.add_argument("--width-mult", type=float, default=1.0,
                    help="shrink the model for CPU functional smoke tests")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--img-w", type=int, default=128,
                    help="input width (width-bucket scaling measurements)")
    ap.add_argument("--skip-bf16", action="store_true",
                    help="skip the bf16 reference timing/compile")
    args = ap.parse_args()

    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.ops.ctc import ctc_greedy_decode_jnp

    B, img_h, img_w, max_len = args.batch, 32, args.img_w, 25
    common = dict(
        num_classes=194, hidden_size=args.hidden, sos_id=1, eos_id=2, pad_id=0,
        blank_id=None, with_ctc_head=True, ctc_blank_id=0,
        width_mult=args.width_mult, dtype=jnp.bfloat16, use_pallas=False,
    )
    model = RCNN(**common)
    variants = {
        "static": RCNN(**common, quantize=True, act_quant="static"),
        "static+stem": RCNN(
            **common, quantize=True, act_quant="static", quantize_stem=True
        ),
    }

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng},
        jnp.zeros((2, img_h, img_w, 3), jnp.float32),
        text=jnp.zeros((2, max_len + 1), jnp.int32),
        batch_max_length=max_len,
        method=model.init_all,
    )
    variables = jax.device_put(variables)
    images = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(B, img_h, img_w, 3))
        .astype(np.float32)
    )

    def make_decode(m):
        @jax.jit
        def decode(variables, images):
            logits = m.apply(variables, images, train=False, method=m.ctc_logits)
            return ctc_greedy_decode_jnp(logits, 0)

        return decode

    print(f"[quant] platform={jax.devices()[0].platform} batch={B} "
          f"img_w={img_w}", file=sys.stderr)

    tokens_ref = None
    if not args.skip_bf16:
        decode_ref = make_decode(model)
        t_ref = _time_fn(decode_ref, variables, images, iters=args.iters)
        tokens_ref = _fetch(decode_ref(variables, images))[0]
        print(f"[quant] bf16          {t_ref * 1e3:8.2f} ms  "
              f"{B / t_ref:10,.0f} img/s", file=sys.stderr)

    for name, m in variants.items():
        @jax.jit
        def calibrate(variables, images, m=m):
            _, mutated = m.apply(
                variables, images, train=False, method=m.encode,
                mutable=["quant_stats"],
            )
            return mutated["quant_stats"]

        v = jax.device_put(
            {**variables, "quant_stats": _fetch(calibrate(variables, images))}
        )
        decode = make_decode(m)
        t = _time_fn(decode, v, images, iters=args.iters)
        line = f"[quant] {name:13s} {t * 1e3:8.2f} ms  {B / t:10,.0f} img/s"
        if tokens_ref is not None:
            tokens = _fetch(decode(v, images))[0]
            agree = float(np.mean(np.all(tokens == tokens_ref, axis=-1)))
            line += f"  token-agreement(vs bf16, random-weight) {agree:.3f}"
        print(line, file=sys.stderr)


if __name__ == "__main__":
    main()
