"""Measure the disk transform cache (`rcnn_ocr_tpu.data.cache`).

Host-side loader throughput on production-sized JPEG lines, three ways:

* ``no-cache``   — decode + ResizeAndPad every epoch (the reference's
  behavior every epoch, `/root/reference/data/dataset.py:238-276`)
* ``cache fill`` — first epoch with ``cache_dir``: decode + resize + a
  memmap row write per sample
* ``cache hit``  — epoch >= 2: pure memmap row reads

Run: ``JAX_PLATFORMS=cpu python tools/cache_bench.py [--n 1024]``
(one process; host work only — the numbers are single-core, see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def make_jpeg_lines(root: str, n: int, h: int = 48) -> str:
    """Render n text-line JPEGs of varying width; returns the CSV path."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    csv_path = os.path.join(root, "labels.csv")
    alphabet = list("abcdefghijklmnopqrstuvwxyz ")
    with open(csv_path, "w", encoding="utf-8") as f:
        for i in range(n):
            k = int(rng.integers(4, 20))
            text = "".join(rng.choice(alphabet, size=k)).strip() or "x"
            w = int(rng.integers(120, 420))
            img = np.full((h, w, 3), 255, np.uint8)
            cv2.putText(img, text, (4, h - 12), cv2.FONT_HERSHEY_SIMPLEX,
                        1.0, (0, 0, 0), 2, cv2.LINE_AA)
            img += rng.integers(0, 12, size=img.shape, dtype=np.uint8)
            fname = f"line_{i:05d}.jpg"
            cv2.imwrite(os.path.join(root, fname), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
            f.write(f"{fname},{text}\n")
    return csv_path


def epoch_time(loader) -> float:
    t0 = time.perf_counter()
    count = 0
    for batch in loader:
        count += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    return count / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args()

    from rcnn_ocr_tpu.data.dataset import OCRDataset
    from rcnn_ocr_tpu.data.loader import DataLoader
    from rcnn_ocr_tpu.data.transforms import ResizeAndPad
    from rcnn_ocr_tpu.vocab.charset import Charset

    work = tempfile.mkdtemp(prefix="cache_bench_")
    try:
        csv_path = make_jpeg_lines(os.path.join(work, "data"), args.n)
        toks = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>", " "] + list(
            "abcdefghijklmnopqrstuvwxyz"
        )
        charset = Charset.from_tokens(toks)
        tf = ResizeAndPad(img_h=64, img_w=256)
        ds = OCRDataset(
            csv_path, os.path.dirname(csv_path), charset.stoi,
            img_height=64, img_max_width=256, transform=tf, verbose=False,
        )
        batches = [
            list(range(lo, min(lo + args.batch_size, len(ds))))
            for lo in range(0, len(ds), args.batch_size)
        ]

        def loader(cache_dir=None):
            return DataLoader(
                ds, batches, charset, max_len=25,
                static_batch_size=args.batch_size, cache_dir=cache_dir,
            )

        plain = loader()
        no_cache = min(epoch_time(plain) for _ in range(2))

        cache_dir = os.path.join(work, "tcache")
        cached = loader(cache_dir=cache_dir)
        fill = epoch_time(cached)
        hit = min(epoch_time(cached) for _ in range(2))
        disk = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(cache_dir) for f in fs
        )
        print(f"n={args.n} imgs  batch={args.batch_size}  row=64x256 uint8")
        print(f"no-cache epoch : {no_cache:8.0f} img/s")
        print(f"cache-fill     : {fill:8.0f} img/s")
        print(f"cache-hit epoch: {hit:8.0f} img/s   ({hit / no_cache:.2f}x)")
        print(f"cache size     : {disk / 1e6:.1f} MB "
              f"({disk / args.n / 1024:.0f} KiB/row)")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
