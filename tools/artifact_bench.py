"""Exported-artifact serving vs the live engine: cold start + throughput.

The deployment claim of `rcnn_ocr_tpu/export.py` is that a StableHLO
artifact serves EXACTLY like `OCRInference.predict_serving` — same host
pipeline, same kernel — with no model code at the serving host.  This
measures both sides of that claim on one process:

  cold start   first-batch wall time: live = Python trace + compile;
               artifact = deserialize + compile (no re-trace)
  throughput   steady-state end-to-end img/s over the same in-memory
               images (host letterbox + transfer + device decode + fetch)
  parity       decoded strings must be identical

Usage:  python tools/artifact_bench.py                    # TPU, int8-static
        JAX_PLATFORMS=cpu python tools/artifact_bench.py --tiny --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--images", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--no-quant", action="store_true")
    ap.add_argument("--method", default="ctc_greedy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.export import ServingArtifact, export_serving_artifact
    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state
    from rcnn_ocr_tpu.vocab.charset import Charset

    img_h, img_w, max_len = 32, 128, 25
    hidden = 32 if args.tiny else 256
    width_mult = 0.125 if args.tiny else 1.0
    charset_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "charset.txt",
    )
    cs = Charset.from_file(charset_file)

    model = RCNN(
        num_classes=cs.num_classes, hidden_size=hidden, width_mult=width_mult,
        sos_id=cs.sos_id, eos_id=cs.eos_id, pad_id=cs.pad_id,
        blank_id=cs.blank_id, with_ctc_head=True, ctc_blank_id=cs.ctc_blank_id,
        dtype=jnp.bfloat16, use_pallas=False,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, img_h, img_w, 3), jnp.float32),
        text=jnp.zeros((2, max_len + 1), jnp.int32),
        batch_max_length=max_len,
        method=model.init_all,
    )
    state = create_train_state(model, variables, build_optimizer("Adam", 1e-3))

    work = tempfile.mkdtemp(prefix="artifact_bench_")
    try:
        ckpt = os.path.join(work, "w.msgpack")
        ckpt_io.save_weights(ckpt, state)

        rng = np.random.default_rng(0)
        images = [
            rng.integers(0, 256, (img_h, w, 3), dtype=np.uint8)
            for w in rng.integers(48, img_w + 1, args.images)
        ]
        canvas = (img_h, img_w)
        kw = dict(
            method=args.method, batch_size=args.batch, canvas=canvas,
            max_length=max_len,
        )

        quant = not args.no_quant
        ocr = OCRInference(
            ckpt, charset_file, img_h=img_h, img_w=img_w, quantize=quant,
            verbose=False,
        )
        if quant:
            t0 = time.perf_counter()
            ocr.calibrate(images[: args.batch], batch_size=args.batch)
            print(f"calibrate: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

        art_dir = os.path.join(work, "artifact")
        t0 = time.perf_counter()
        export_serving_artifact(
            ocr, art_dir, method=args.method, batch_size=args.batch,
            canvas=canvas, max_length=max_len,
        )
        export_s = time.perf_counter() - t0
        kernel_bytes = sum(
            os.path.getsize(os.path.join(art_dir, f))
            for f in os.listdir(art_dir) if f.endswith(".stablehlo")
        )

        # cold start: first full batch through each side
        warm = images[: args.batch]
        t0 = time.perf_counter()
        live_first = ocr.predict_serving(warm, **kw)
        live_cold_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        art = ServingArtifact.load(art_dir)
        art_load_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        art_first = art.predict(warm)
        art_cold_s = time.perf_counter() - t0
        assert art_first == live_first, "artifact decode != live decode"

        def timed(fn):
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            return out, args.images / best

        live_out, live_ips = timed(lambda: ocr.predict_serving(images, **kw))
        art_out, art_ips = timed(lambda: art.predict(images))
        assert art_out == live_out, "steady-state decode mismatch"

        print(json.dumps({
            "platform": jax.devices()[0].platform,
            "method": args.method,
            "quantize": quant,
            "act_quant": getattr(ocr.model, "act_quant", None),
            "batch": args.batch,
            "images": args.images,
            "export_s": round(export_s, 2),
            "artifact_kernel_bytes": kernel_bytes,
            "live_cold_s": round(live_cold_s, 2),
            "artifact_load_s": round(art_load_s, 2),
            "artifact_cold_s": round(art_cold_s, 2),
            "live_img_s": round(live_ips, 1),
            "artifact_img_s": round(art_ips, 1),
            "parity": True,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
