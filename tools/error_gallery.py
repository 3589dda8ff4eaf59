#!/usr/bin/env python
"""Render the worst predictions from an evaluation as an image gallery.

Closes the error-analysis loop visually: `evaluate_dataset.py` writes
``evaluation_results_<model>.csv`` with per-sample rows (image_path,
true_text, predicted_text, cer, wer, exact_match); this tool reads that
CSV, sorts by CER, and renders the worst N line images with their
ground-truth and predicted strings side by side — the debugging view the
per-sample CSV only hints at:

    python evaluate_dataset.py --model … --csv labels.csv --root imgs/
    python tools/error_gallery.py evaluation_results_model.csv \
        --root imgs/ --out worst.png [--n 24] [--best]

``--best`` flips the sort (sanity-check what the model gets right);
rows the evaluator scored exact_match are skipped unless ``--all``.
Exit 1 when the CSV is missing or nothing qualifies.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys


def load_rows(csv_path: str):
    with open(csv_path, encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    needed = {"image_path", "true_text", "predicted_text", "cer"}
    if rows and not needed.issubset(rows[0]):
        raise ValueError(
            f"{csv_path} is not an evaluation_results CSV "
            f"(needs columns {sorted(needed)})"
        )
    return rows


def pick_rows(rows, n: int, best: bool, include_correct: bool):
    if not include_correct:
        rows = [r for r in rows if r.get("exact_match", "").lower() != "true"]
    rows.sort(key=lambda r: float(r["cer"]), reverse=not best)
    return rows[:n]


def render_gallery(picked, root: str, out_path: str) -> int:
    """Draw one panel per row: the line image, truth above, prediction
    below (red).  Returns the number of panels drawn."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    try:
        import cv2

        def read(path):
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            return None if img is None else img[:, :, ::-1]
    except ImportError:  # matplotlib can read PNG itself
        def read(path):
            try:
                return plt.imread(path)
            except Exception:
                return None

    panels = []
    for r in picked:
        path = r["image_path"]
        if not os.path.isabs(path):
            path = os.path.join(root, path)
        img = read(path)
        if img is None:
            print(f"  (unreadable, skipped: {path})", file=sys.stderr)
            continue
        panels.append((img, r))
    if not panels:
        return 0

    cols = 2 if len(panels) > 4 else 1
    rows_n = (len(panels) + cols - 1) // cols
    fig, axes = plt.subplots(
        rows_n, cols, figsize=(7 * cols, 1.6 * rows_n), squeeze=False
    )
    for ax in axes.ravel():
        ax.axis("off")
    for ax, (img, r) in zip(axes.ravel(), panels):
        ax.imshow(np.asarray(img), aspect="auto", cmap="gray")
        ax.set_title(
            f"true: {r['true_text']!r}    CER {float(r['cer']):.2f}",
            fontsize=9, loc="left",
        )
        ax.set_xlabel(f"pred: {r['predicted_text']!r}", fontsize=9, color="red")
        ax.axis("on")
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return len(panels)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("csv", help="evaluation_results_<model>.csv from the eval CLI")
    p.add_argument("--root", default=".", help="image directory (paths in the CSV are basenames)")
    p.add_argument("--out", default="error_gallery.png", help="output PNG")
    p.add_argument("--n", type=int, default=16, help="panels to render")
    p.add_argument("--best", action="store_true", help="lowest-CER rows instead (sanity view)")
    p.add_argument("--all", action="store_true", help="include exact-match rows")
    args = p.parse_args(argv)

    if not os.path.exists(args.csv):
        print(f"CSV not found: {args.csv}")
        return 1
    try:
        rows = load_rows(args.csv)
    except ValueError as e:
        print(str(e))
        return 1
    picked = pick_rows(rows, args.n, args.best, args.all)
    if not picked:
        print("nothing to render (every row was an exact match — try --all)")
        return 1
    drawn = render_gallery(picked, args.root, args.out)
    if not drawn:
        print("no readable images among the selected rows")
        return 1
    print(f"wrote {drawn} panels to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
