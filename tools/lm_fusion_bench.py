"""Cost of bigram-LM shallow fusion inside the device beams (one chip).

Measures attn_beam8 and ctc_beam16 (int8-static, production shape) with
and without a [V, V] fusion table — the expected delta is ~zero: fusion
is one row-gather per step against kernels dominated by the encoder and
the beams' top-k machinery.

Run (TPU, serial): python tools/lm_fusion_bench.py
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
    from rcnn_ocr_tpu.ops.ctc import ctc_beam_search_jax

    platform = jax.devices()[0].platform
    batch = 2048 if platform == "tpu" else 4
    img_h, img_w, num_classes, max_len = 32, 128, 194, 25

    model = RCNN(
        num_classes=num_classes, hidden_size=256, sos_id=1, eos_id=2,
        pad_id=0, blank_id=None, with_ctc_head=True, ctc_blank_id=0,
        dtype=jnp.bfloat16, use_pallas=False, quantize=True,
        act_quant="static",
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((2, img_h, img_w, 3), jnp.float32),
        text=jnp.zeros((2, max_len + 1), jnp.int32), batch_max_length=max_len,
        method=model.init_all,
    )

    @jax.jit
    def calibrate(variables, images):
        _, mutated = model.apply(
            variables, images, train=False, method=model.encode,
            mutable=["quant_stats"],
        )
        return mutated["quant_stats"]

    images = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(batch, img_h, img_w, 3))
        .astype(np.float32)
    )
    variables = {
        **variables, "quant_stats": fetch(calibrate(jax.device_put(variables), images))
    }
    variables = jax.device_put(variables)
    lm = jnp.asarray(
        np.random.default_rng(1)
        .normal(size=(num_classes, num_classes))
        .astype(np.float32)
    )

    def attn_beam(lm_logp, lm_weight):
        @jax.jit
        def run(variables, images):
            return model.apply(
                variables, images, beam_width=8, batch_max_length=max_len,
                lm_logp=lm_logp, lm_weight=lm_weight,
                method=model.beam_decode,
            )

        return run

    def ctc_beam(lm_logp, lm_weight):
        @jax.jit
        def run(variables, images):
            logits = model.apply(
                variables, images, train=False, method=model.ctc_logits
            )
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            vals, idx = jax.lax.top_k(log_probs, 16)
            labels, lens, _ = ctc_beam_search_jax(
                vals, idx.astype(jnp.int32), blank_id=0, beam_width=16,
                lm_logp=lm_logp, lm_weight=lm_weight,
            )
            return labels, lens

        return run

    results = {"platform": platform, "batch": batch}
    for name, fn in (
        ("attn_beam8", attn_beam(None, 0.0)),
        ("attn_beam8_lm", attn_beam(lm, 0.5)),
        ("ctc_beam16", ctc_beam(None, 0.0)),
        ("ctc_beam16_lm", ctc_beam(lm, 0.5)),
    ):
        dt = time_fn(fn, variables, images)
        results[f"{name}_img_s"] = round(batch / dt, 1)
        print(f"[lm_fusion_bench] {name}: {results[f'{name}_img_s']:,} img/s",
              file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
