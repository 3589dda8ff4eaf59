"""Long-line decode throughput on the real chip (flagship model size).

Measures end-to-end img/s (host tiling/stitch/segmentation INCLUDED — the
long paths are host-driver + device-kernel pipelines, so wall time on a
real batch is the honest number) for:

* squash `predict` / `predict_ctc` — the fixed-canvas baseline every
  fixed-width engine (and the reference) applies to wide lines
* `predict_ctc_long` — tiled frame-stitch decode
* `predict_long(method="attention")` — tiled seq2seq + aligned merge
* `predict_hybrid_long` — CTC segments, attention reads

Flagship shape: 194 classes, hidden 256, random weights (throughput only;
accuracy is the demo corpus' job, `tools/long_line_demo.py`).  Synthetic
32x512 px lines -> 4-5 tiles of 128 px at the default overlap.

Usage:  RCNN_OCR_COMPILE_CACHE=/tmp/xla_cache python tools/long_line_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state

    n_images, line_w = int(os.environ.get("N", 256)), 512
    img_h, img_w = 32, 128
    tokens = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>"] + [chr(c) for c in range(33, 33 + 190)]

    import tempfile

    work = tempfile.mkdtemp(prefix="llb_")
    cs_path = os.path.join(work, "cs.txt")
    with open(cs_path, "w", encoding="utf-8") as f:
        f.write("\n".join(tokens) + "\n")
    model = RCNN(num_classes=len(tokens), hidden_size=256, with_ctc_head=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img_h, img_w, 3)),
        text=jnp.zeros((1, 5), jnp.int32), batch_max_length=4,
        method=model.init_all,
    )
    state = create_train_state(model, variables, build_optimizer("Adam", 1e-3))
    ckpt = os.path.join(work, "w.msgpack")
    ckpt_io.save_weights(ckpt, state)
    ocr = OCRInference(ckpt, cs_path, img_h=img_h, img_w=img_w, verbose=False)

    rng = np.random.default_rng(0)
    images = [
        rng.integers(0, 256, (img_h, line_w, 3)).astype(np.uint8)
        for _ in range(n_images)
    ]
    bs = 256

    def timed(name, fn):
        fn()  # warmup (compiles through the cache)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        rate = n_images / dt
        print(f"[long_line_bench] {name:24s} {rate:10.1f} img/s  ({dt*1e3:.0f} ms)",
              file=sys.stderr, flush=True)
        return rate

    results = {
        "squash_attention": timed(
            "squash predict", lambda: ocr.predict(images, max_length=25, batch_size=bs)),
        "squash_ctc": timed(
            "squash predict_ctc", lambda: ocr.predict_ctc(images, batch_size=bs)),
        "ctc_long": timed(
            "predict_ctc_long", lambda: ocr.predict_ctc_long(images, batch_size=bs)),
        "attention_long": timed(
            "predict_long attention", lambda: ocr.predict_long(
                images, method="attention", batch_size=bs, max_length=25)),
        "hybrid_long": timed(
            "predict_hybrid_long", lambda: ocr.predict_hybrid_long(
                images, batch_size=bs, max_length=25)),
    }
    print(json.dumps({"long_line_img_s": results, "n": n_images,
                      "line_w": line_w, "platform": jax.devices()[0].platform}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
