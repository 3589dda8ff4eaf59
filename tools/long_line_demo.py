"""Long-line decoding demo: squash vs tiled, blank-snap vs midpoint cuts.

Reproducible version of the PERF.md long-line measurement (round 3 ran it
ad hoc): train a small aspect-native model on SHORT synthetic lines, then
decode LONG lines (8/16/24 chars rendered at natural width) through every
path and report CER:

* ``squash_attention`` / ``squash_ctc`` — the fixed-canvas resize every
  fixed-width engine (and the reference) applies; the only baseline.
* ``ctc_long_blank`` / ``ctc_long_midpoint`` — the frame-stitched decode
  with blank-snap vs midpoint junction cuts (the A/B VERDICT r3 weak #6
  asks for, on a model trained on character-dense renders).
* ``ctc_long_beam`` — stitched + host prefix beam.
* ``attention_long_align`` / ``attention_long_text`` — per-tile seq2seq
  decode with the frame-aligned junction merge (the decoder's attention
  argmax positions each character; the default) vs the position-free
  text-space merge (`predict_long`, VERDICT r3 missing #2).
* ``attention_long_beam_align`` — the same with the device beam per tile.
* ``hybrid_long`` / ``hybrid_long_beam`` — CTC-blank segmentation +
  per-segment attention decode at full resolution (`predict_hybrid_long`).

Usage (CPU, ~10 min with training; cache the model dir to re-measure):

    JAX_PLATFORMS=cpu python tools/long_line_demo.py --work /tmp/lld
    JAX_PLATFORMS=cpu python tools/long_line_demo.py --work /tmp/lld --skip-train
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ALPHABET = "abcdefghij"
CHARSET = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>"] + list(ALPHABET)

# set by --corpus: the second-corpus mode renders with the glyph-aware
# synthetic generator (TTF font, hard-preset noise/blur/shear) instead of
# the thin HERSHEY stroke — a different font AND character density, the
# transfer check VERDICT r4 weak #3 asks for
_RENDER_MODE = "hershey"
_FONT = None


def render(text: str, rng) -> np.ndarray:
    if _RENDER_MODE == "hershey":
        from helpers import render_text_image

        # ~10 px per char at FONT_HERSHEY_SIMPLEX 0.5 -> aspect-native width
        return render_text_image(text, h=24, w=10 * len(text) + 8, rng=rng)
    from rcnn_ocr_tpu.data.synthetic import render_line

    return render_line(
        text, _FONT, img_h=24, rng=rng, difficulty=_RENDER_MODE
    )


def build_train_set(work: str, n: int, rng) -> tuple:
    import csv

    import cv2

    root = os.path.join(work, "train")
    os.makedirs(root, exist_ok=True)
    csv_path = os.path.join(root, "labels.csv")
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        wr = csv.writer(f)
        for i in range(n):
            text = "".join(rng.choice(list(ALPHABET), rng.integers(1, 5)))
            img = render(text, rng)
            cv2.imwrite(os.path.join(root, f"im{i:05d}.png"), img)
            wr.writerow([f"im{i:05d}.png", text])
    return csv_path, root


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default="/tmp/long_line_demo")
    ap.add_argument("--train-samples", type=int, default=768)
    ap.add_argument("--eval-per-length", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the model already in --work")
    ap.add_argument("--tile-w", type=int, default=64)
    ap.add_argument("--overlap", type=int, default=24)
    ap.add_argument(
        "--edge-crop", type=float, default=0.0,
        help="p_EdgeCrop for training (tile-edge truncation augmentation; "
        "the round-5 experiment against the attention long-line plateau)",
    )
    ap.add_argument(
        "--corpus", choices=("hershey", "clean", "medium", "hard"),
        default="hershey",
        help="rendering: the historical HERSHEY strokes, or the glyph-aware "
        "synthetic generator at the named difficulty (second-corpus "
        "transfer check)",
    )
    ap.add_argument("--width-mult", type=float, default=0.125)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument(
        "--sweep", action="store_true",
        help="also sweep overlap (ctc_long) and min_gap x margin (hybrid) "
        "around the shipped defaults and report the grids",
    )
    args = ap.parse_args()

    global _RENDER_MODE, _FONT
    _RENDER_MODE = args.corpus
    if args.corpus != "hershey":
        from rcnn_ocr_tpu.data.synthetic import discover_fonts

        fonts = discover_fonts()
        if not fonts:
            raise SystemExit("no TTF fonts discoverable for --corpus")
        _FONT = fonts[-1]  # a DIFFERENT font than generators' default pick

    os.makedirs(args.work, exist_ok=True)
    rng = np.random.default_rng(0)
    charset_path = os.path.join(args.work, "charset.txt")
    with open(charset_path, "w", encoding="utf-8") as f:
        f.write("\n".join(CHARSET) + "\n")

    exp_dir = os.path.join(args.work, "exp")
    ckpt = os.path.join(exp_dir, "best_acc_weights.msgpack")
    if not args.skip_train or not os.path.exists(ckpt):
        csv_path, root = build_train_set(args.work, args.train_samples, rng)
        from rcnn_ocr_tpu.training.config import Config
        from rcnn_ocr_tpu.training.train import run_training

        cfg = Config(
            {
                "exp_dir": exp_dir,
                "train_csvs": [csv_path],
                "train_roots": [root],
                "charset_path": charset_path,
                "img_h": 32,
                "img_w": args.tile_w,
                "max_len": 6,
                "batch_size": 32,
                "epochs": args.epochs,
                "width_mult": args.width_mult,
                "hidden_size": args.hidden,
                "compute_dtype": "float32",
                "use_pallas": False,
                "head": "both",
                "val_size": 96,
                "p_EdgeCrop": args.edge_crop,
            }
        )
        run_training(cfg)

    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.training.metrics import character_error_rate

    ocr = OCRInference(
        ckpt, charset_path, img_h=32, img_w=args.tile_w, verbose=False,
        dtype=jnp.float32,
    )

    # long-line eval corpus at natural width
    eval_rng = np.random.default_rng(1)
    truths, images = [], []
    for length in (8, 16, 24):
        for _ in range(args.eval_per_length):
            text = "".join(eval_rng.choice(list(ALPHABET), length))
            truths.append(text)
            images.append(render(text, eval_rng))

    tw, ov = args.tile_w, args.overlap

    def cer(preds):
        return float(np.mean([
            character_error_rate(t, p) for t, p in zip(truths, preds)
        ]))

    results = {
        "squash_attention": cer(ocr.predict(images, max_length=30, batch_size=16)),
        "squash_ctc": cer(ocr.predict_ctc(images, batch_size=16)),
        "ctc_long_blank": cer(ocr.predict_ctc_long(
            images, tile_w=tw, overlap=ov, snap="blank")),
        "ctc_long_midpoint": cer(ocr.predict_ctc_long(
            images, tile_w=tw, overlap=ov, snap="midpoint")),
        "ctc_long_beam": cer(ocr.predict_ctc_long(
            images, tile_w=tw, overlap=ov, method="beam", beam_width=8)),
        "attention_long_align": cer(ocr.predict_long(
            images, method="attention", tile_w=tw, overlap=ov, max_length=12,
            merge="align")),
        "attention_long_text": cer(ocr.predict_long(
            images, method="attention", tile_w=tw, overlap=ov, max_length=12,
            merge="text")),
        "attention_long_beam_align": cer(ocr.predict_long(
            images, method="attention_beam", beam_width=8, tile_w=tw,
            overlap=ov, max_length=12, merge="align")),
        "hybrid_long": cer(ocr.predict_long(
            images, method="hybrid", tile_w=tw, overlap=ov, max_length=12)),
        "hybrid_long_beam": cer(ocr.predict_long(
            images, method="hybrid_beam", beam_width=8, tile_w=tw,
            overlap=ov, max_length=12)),
    }
    for k, v in results.items():
        print(f"[long_line_demo] {k:20s} CER {v:.4f}", file=sys.stderr)

    sweeps = {}
    if args.sweep:
        # do the shipped defaults transfer? overlap grid for the CTC
        # stitcher (engine default: min(64, tile_w/2)) and the
        # min_gap x margin grid for hybrid (defaults 3 x 1)
        sweeps["ctc_long_overlap"] = {
            str(o): cer(ocr.predict_ctc_long(images, tile_w=tw, overlap=o))
            for o in (16, 24, 32, 48)
        }
        sweeps["hybrid_gap_margin"] = {
            f"{g}x{m}": cer(ocr.predict_hybrid_long(
                images, tile_w=tw, overlap=ov, max_length=12,
                min_gap=g, margin=m,
            ))
            for g in (2, 3, 4) for m in (0, 1, 2)
        }
        for name, grid in sweeps.items():
            for k, v in grid.items():
                print(f"[sweep] {name} {k:6s} CER {v:.4f}", file=sys.stderr)

    print(json.dumps({
        "long_line_cer": results, "tile_w": tw, "overlap": ov,
        "n_eval": len(truths), "ckpt": ckpt, "edge_crop": args.edge_crop,
        "corpus": args.corpus, "width_mult": args.width_mult,
        "hidden": args.hidden, **({"sweeps": sweeps} if sweeps else {}),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
