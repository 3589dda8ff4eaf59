"""Step-only training throughput: grad_accum and ema_decay overhead.

Measures the jitted train step (production scale: hidden 256, vocab 194,
head=both, bf16, 32x128) on the current backend for:

* plain step at bs1024 (the round-2 saturation point);
* grad_accum 2/4 at the same global batch (the scan should cost ~nothing:
  same FLOPs, fewer live activations);
* ema_decay=0.999 (one fused elementwise pass over 46M params);
* grad_accum at a global batch the plain step may not fit (memory story).

Timing per CLAUDE.md: a real device->host loss fetch bounds each window
(block_until_ready is a no-op on the remote TPU platform).

    python tools/step_bench.py            # real chip
    JAX_PLATFORMS=cpu python tools/step_bench.py   # smoke
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def build(batch: int, accum: int, ema: float):
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state, make_train_step

    model = RCNN(
        num_classes=194, hidden_size=256, sos_id=1, eos_id=2, pad_id=0,
        blank_id=None, with_ctc_head=True, ctc_blank_id=0,
        dtype=jnp.bfloat16, use_pallas=False,
    )
    max_len = 25
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 32, 128, 3), jnp.float32),
        text=jnp.zeros((2, max_len + 1), jnp.int32),
        batch_max_length=max_len,
        method=model.init_all,
    )
    tx = build_optimizer("Adam", 1e-3)
    state = create_train_state(model, variables, tx, ema=ema > 0)
    step = make_train_step(
        model, tx, max_len, pad_id=0, head="both", ctc_blank_id=0,
        grad_accum=accum, ema_decay=ema,
    )

    gen = np.random.default_rng(0)
    mb = batch // accum
    shape = (accum, mb) if accum > 1 else (batch,)
    labels = gen.integers(3, 194, size=shape + (12,)).astype(np.int32)
    batch_np = {
        "image": gen.normal(size=shape + (32, 128, 3)).astype(np.float32),
        "text_in": np.concatenate(
            [np.full(shape + (1,), 1, np.int32),
             np.pad(labels, [(0, 0)] * len(shape) + [(0, max_len - 11)])[..., : max_len]],
            axis=-1,
        ),
        "target_y": np.pad(
            labels, [(0, 0)] * len(shape) + [(0, max_len + 1 - 12)]
        ),
        "ctc_labels": labels,
        "ctc_paddings": np.zeros(shape + (12,), np.float32),
        "valid": np.ones(shape, np.bool_),
    }
    return state, step, jax.device_put(batch_np)


def measure(batch: int, accum: int = 1, ema: float = 0.0, iters: int = 5):
    state, step, dev_batch = build(batch, accum, ema)
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, dev_batch, rng)  # compile
    state, metrics = step(state, dev_batch, rng)  # warm
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, dev_batch, jax.random.fold_in(rng, i))
    loss = float(metrics["loss"])  # forces completion of the chain
    dt = (time.perf_counter() - t0) / iters
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    return {
        "img_s": batch / dt,
        "step_ms": dt * 1e3,
        "loss": loss,
        "peak_gb": round(peak / 2**30, 2) if peak else None,
    }


def main():
    platform = jax.devices()[0].platform
    big = platform == "tpu"
    bs = 1024 if big else 16
    cases = [
        ("plain", dict(batch=bs)),
        ("accum2", dict(batch=bs, accum=2)),
        ("accum4", dict(batch=bs, accum=4)),
        ("ema", dict(batch=bs, ema=0.999)),
    ]
    if big:
        # the memory story: a global batch the plain step may not fit
        cases += [("accum4_bs4096", dict(batch=4096, accum=4)),
                  ("plain_bs4096", dict(batch=4096))]
    for name, kw in cases:
        try:
            r = measure(**kw)
            print(
                f"{name:>16}: {r['img_s']:8,.0f} img/s  {r['step_ms']:7.1f} ms"
                + (f"  peak={r['peak_gb']} GB" if r["peak_gb"] else "")
                + f"  loss={r['loss']:.3f}"
            )
        except Exception as e:
            print(f"{name:>16}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
