"""Build a character bigram LM from labels CSVs for beam shallow fusion.

Usage:
    python tools/train_lm.py --charset configs/charset.txt \
        --out lm.npz --alpha 1.0 \
        data/handwritten/train/labels.csv data/printed/train/labels.csv

Reads the same headerless ``filename,text`` CSVs training uses (``.tsv``
-> tab; a ``filename,text`` header row is tolerated and skipped), counts
character transitions, and writes a compressed ``[V, V]`` log-prob table
keyed to the charset's token order (`rcnn_ocr_tpu/lm.py`).

Use it:
    ocr = OCRInference(model, charset, lm="lm.npz")
    ocr.predict(imgs, beam_width=8, lm_weight=0.3)
    # or: evaluate_dataset.py --decode attention_beam --lm lm.npz --lm-weight 0.3
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def iter_labels(csv_path: str):
    delim = "\t" if csv_path.endswith(".tsv") else ","
    with open(csv_path, newline="", encoding="utf-8") as f:
        for i, row in enumerate(csv.reader(f, delimiter=delim)):
            if len(row) < 2:
                continue
            if i == 0 and row[0].strip().lower() == "filename":
                continue  # eval-style header row
            yield row[1]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csvs", nargs="+", help="labels CSV/TSV files")
    ap.add_argument("--charset", required=True, help="token-per-line charset")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--alpha", type=float, default=1.0, help="add-alpha smoothing")
    args = ap.parse_args()

    from rcnn_ocr_tpu.lm import bigram_counts, bigram_logp, save_lm
    from rcnn_ocr_tpu.vocab.charset import Charset

    charset = Charset.from_file(args.charset)

    def texts():
        for path in args.csvs:
            yield from iter_labels(path)

    counts = bigram_counts(texts(), charset)
    n_trans = int(counts.sum())
    logp = bigram_logp(counts, charset, alpha=args.alpha)
    save_lm(args.out, logp, charset.itos)
    size_kb = os.path.getsize(args.out) / 1e3
    print(
        f"bigram LM: {n_trans:,} transitions from {len(args.csvs)} file(s) -> "
        f"{args.out} ([{charset.num_classes}, {charset.num_classes}] fp32, "
        f"{size_kb:.0f} kB, alpha={args.alpha})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
