"""Training-throughput benchmark: the REAL `run_training` loop end-to-end.

Measures steady-state images/sec (parsed from the per-epoch `imgs/s=` log
line, which times the full hot loop: threaded loading, augmentation, H2D
transfer, jitted train step) for the scenarios PERF.md tracks:

  fixed-512        bs512,  W=128, host augmentation
  fixed-1024       bs1024, W=128, host augmentation
  device-aug-512   bs512,  on-device augmentation (uint8 host batches)
  bucketed-512     bs512,  mixed-width data, width_buckets=[64, 128]
  padded-512       bs512,  the same mixed-width data padded to one W=128

The first epoch pays the remote compile; throughput is max(epochs >= 2).
Everything runs in ONE process (remote TPU compiles are serialized through
one tunnel — CLAUDE.md environment rules).

Usage:  python tools/train_bench.py [--epochs 3] [--n-imgs 24576]
        JAX_PLATFORMS=cpu python tools/train_bench.py --n-imgs 256 --epochs 2 --tiny
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
import shutil
import sys
import tempfile

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
CHARSET = ["<PAD>", "<SOS>", "<EOS>", " "] + list(ALPHABET)


def render(text: str, h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    img = np.full((h, w, 3), 255, dtype=np.uint8)
    cv2.putText(img, text, (2, h - 6), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1)
    noise = rng.integers(-8, 8, size=img.shape, dtype=np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def make_dataset(root: str, n: int, widths, seed: int = 0) -> str:
    """n rendered lines cycling over `widths` canvases; returns csv path."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    csv_path = os.path.join(root, "labels.csv")
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        wr = csv.writer(f)
        for i in range(n):
            k = int(rng.integers(3, 9))
            label = "".join(rng.choice(list(ALPHABET), size=k))
            w = widths[i % len(widths)]
            fname = f"img_{i:06d}.png"
            cv2.imwrite(os.path.join(root, fname),
                        cv2.cvtColor(render(label, 24, w, rng), cv2.COLOR_RGB2BGR))
            wr.writerow([fname, label])
    return csv_path


def steady_imgs_per_sec(exp_dir: str) -> float:
    """Max per-epoch imgs/s over epochs >= 2 (epoch 1 pays the compile)."""
    pat = re.compile(r"Epoch (\d+)/\d+.*imgs/s=(\d+)")
    best = 0.0
    with open(os.path.join(exp_dir, "train.log"), encoding="utf-8") as f:
        for line in f:
            m = pat.search(line)
            if m and int(m.group(1)) >= 2:
                best = max(best, float(m.group(2)))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n-imgs", type=int, default=24576)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the model for a CPU smoke run")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of scenario names to run")
    args = ap.parse_args()

    from rcnn_ocr_tpu.training.config import Config
    from rcnn_ocr_tpu.training.train import run_training

    work = args.workdir or tempfile.mkdtemp(prefix="train_bench_")
    os.makedirs(work, exist_ok=True)
    charset_path = os.path.join(work, "charset.txt")
    with open(charset_path, "w", encoding="utf-8") as f:
        f.write("\n".join(CHARSET) + "\n")

    # fixed-aspect set (everything lands in the W=128 bucket) and a mixed
    # set (half narrow -> W<=64 bucket, half wide -> W=128 bucket)
    fixed_csv = make_dataset(os.path.join(work, "fixed"), args.n_imgs, [96])
    mixed_csv = make_dataset(os.path.join(work, "mixed"), args.n_imgs, [40, 96])
    # two single-width corpora for the PROPORTIONAL x bucketed scenarios
    # (the reference's multi-corpus workflow: one narrow set, one wide set)
    narrow_csv = make_dataset(os.path.join(work, "narrow"), args.n_imgs // 2, [40], seed=1)
    wide_csv = make_dataset(os.path.join(work, "wide"), args.n_imgs // 2, [96], seed=2)

    base = dict(
        charset_path=charset_path,
        img_h=32, img_w=128, max_len=12,
        epochs=args.epochs, eval_every=99, val_size=512,
        lr=1e-3, optimizer="Adam", scheduler="CosineAnnealingLR",
        head="both", compute_dtype="bfloat16",
        num_workers=16, log_every=50, progress=False, seed=0,
    )
    if args.tiny:
        base.update(width_mult=0.125, hidden_size=32, num_workers=4, val_size=32)

    scenarios = [
        ("fixed-512", dict(train_csvs=[fixed_csv], batch_size=512)),
        ("fixed-1024", dict(train_csvs=[fixed_csv], batch_size=1024)),
        ("device-aug-512",
         dict(train_csvs=[fixed_csv], batch_size=512, device_augment=True)),
        ("bucketed-512",
         dict(train_csvs=[mixed_csv], batch_size=512, width_buckets=[64, 128])),
        ("padded-512", dict(train_csvs=[mixed_csv], batch_size=512)),
        # proportional two-corpus mixing (narrow + wide), bucketed vs padded:
        # the combination round 2 silently disabled (VERDICT r2 #2)
        ("prop-bucketed-512",
         dict(train_csvs=[narrow_csv, wide_csv], batch_size=512,
              train_proportions=[0.5, 0.5], width_buckets=[64, 128])),
        ("prop-padded-512",
         dict(train_csvs=[narrow_csv, wide_csv], batch_size=512,
              train_proportions=[0.5, 0.5])),
    ]

    results = {}
    for name, over in scenarios:
        if args.only and name not in args.only:
            continue
        if args.tiny:
            over = {**over, "batch_size": max(8, over["batch_size"] // 64)}
        exp_dir = os.path.join(work, f"exp_{name}")
        shutil.rmtree(exp_dir, ignore_errors=True)
        over = dict(over)
        csv_paths = over.pop("train_csvs")
        cfg = Config({**base, **over,
                      "train_csvs": csv_paths,
                      "train_roots": [os.path.dirname(p) for p in csv_paths],
                      "exp_dir": exp_dir})
        print(f"[train_bench] {name} ...", file=sys.stderr, flush=True)
        run_training(cfg)
        ips = steady_imgs_per_sec(exp_dir)
        results[name] = ips
        print(f"[train_bench] {name:16s} {ips:10,.0f} img/s", file=sys.stderr,
              flush=True)

    print(json.dumps({"train_bench_img_s": results, "workdir": work}))


if __name__ == "__main__":
    main()
