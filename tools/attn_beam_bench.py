"""Attention-head beam search throughput at production shape (one chip).

Measures the device-side seq2seq beam (`models/attention.py:_beam_search`)
against the greedy attention decode it generalizes, bf16 and int8-static,
across beam widths — the cost curve a serving owner needs to pick K.

The reference has no seq2seq beam at all (`/root/reference/model/model.py:
91-112` is greedy-only), so there is no baseline number; the comparison
that matters is beam-K vs greedy on THIS framework (quality knob price).

Run (TPU, serial — one JAX process): python tools/attn_beam_bench.py
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools._bench_util import fetch, time_fn  # noqa: E402


def main() -> None:
    from rcnn_ocr_tpu.models import RCNN

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    batch = 2048 if on_tpu else 4
    img_h, img_w = 32, 128
    num_classes = 194
    max_len = 25
    widths = (2, 4, 8, 16) if on_tpu else (2,)

    common = dict(
        num_classes=num_classes, hidden_size=256, sos_id=1, eos_id=2,
        pad_id=0, blank_id=None, dtype=jnp.bfloat16, use_pallas=False,
    )
    model = RCNN(**common)
    model_qs = RCNN(**common, quantize=True, act_quant="static")
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((2, img_h, img_w, 3), jnp.float32),
        train=False, batch_max_length=max_len,
    )
    variables = jax.device_put(variables)
    images = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(batch, img_h, img_w, 3))
        .astype(np.float32)
    )

    @jax.jit
    def greedy(variables, images):
        logits = model.apply(variables, images, train=False, batch_max_length=max_len)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def calibrate(variables, images):
        _, mutated = model_qs.apply(
            variables, images, train=False, method=model_qs.encode,
            mutable=["quant_stats"],
        )
        return mutated["quant_stats"]

    def beam_fn(m, k):
        @jax.jit
        def run(variables, images):
            return m.apply(
                variables, images, beam_width=k, batch_max_length=max_len,
                method=m.beam_decode,
            )

        return run

    results = {"platform": platform, "batch": batch}
    dt = time_fn(greedy, variables, images)
    results["attn_greedy_bf16_img_s"] = round(batch / dt, 1)
    variables_qs = {**variables, "quant_stats": fetch(calibrate(variables, images))}
    variables_qs = jax.device_put(variables_qs)

    for k in widths:
        dt = time_fn(beam_fn(model, k), variables, images)
        results[f"attn_beam{k}_bf16_img_s"] = round(batch / dt, 1)
        dt = time_fn(beam_fn(model_qs, k), variables_qs, images)
        results[f"attn_beam{k}_int8_static_img_s"] = round(batch / dt, 1)
        print(
            f"[attn_beam_bench] K={k}: bf16 {results[f'attn_beam{k}_bf16_img_s']:,} "
            f"img/s, int8-static {results[f'attn_beam{k}_int8_static_img_s']:,} img/s",
            file=sys.stderr,
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
