"""Generate a ready-to-train synthetic OCR dataset (train + val + config).

The reference's training corpus is not redistributable, so this is the
out-of-the-box path to a *runnable* end-to-end workflow: generate, train,
evaluate, export, serve — on data that exists.  Output layout::

    OUT/
      train/            rendered line images + labels.csv (headerless —
                        the training CSV convention, data/dataset.py)
      val/              rendered line images + labels.csv, PLUS
                        eval.csv (headered filename,text — the eval CLI's
                        required form, evaluate_dataset.py)
      charset.txt       token-per-line charset covering the generator's
                        alphabet (specials first; order defines ids)
      config.json       a runnable training config pointing at the above

Run::

    python tools/make_synthetic_dataset.py --out data/synth --n-train 2000
    python example_train.py data/synth/config.json
    python evaluate_dataset.py --model ... --charset data/synth/charset.txt \
        --csv data/synth/val/eval.csv --root data/synth/val

Determinism: the full dataset is a pure function of (--seed, counts,
difficulty, alphabet, fonts discovered on this host).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcnn_ocr_tpu.data.synthetic import (  # noqa: E402
    DIFFICULTIES,
    GENERATION_ALPHABET,
    HOMOGLYPH_FREE_ALPHABET,
    discover_fonts,
    generate_dataset,
)
from rcnn_ocr_tpu.vocab.charset import PAD_TOKEN, SOS_TOKEN, EOS_TOKEN  # noqa: E402


def write_charset(path: str, alphabet: str) -> int:
    """Specials + one token per alphabet char, in alphabet order."""
    tokens = [PAD_TOKEN, SOS_TOKEN, EOS_TOKEN] + list(alphabet)
    with open(path, "w", encoding="utf-8", newline="\n") as f:
        for tok in tokens:
            f.write(tok + "\n")
    return len(tokens)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", required=True, help="output dataset directory")
    p.add_argument("--n-train", type=int, default=512)
    p.add_argument("--n-val", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--img-h", type=int, default=48, help="rendered line height (px)")
    p.add_argument(
        "--difficulty", choices=sorted(DIFFICULTIES), default="medium",
        help="effect-chain strength (clean|medium|hard)",
    )
    p.add_argument(
        "--chars", default=None,
        help="generation alphabet: literal characters, or 'homoglyph-free' "
        "(drops Latin/Cyrillic twins like a/а so exact-match accuracy can "
        "reach 1.0 — use for learning-curve demos and accuracy gates; "
        "default: full latin+digits+cyrillic+punct)",
    )
    p.add_argument(
        "--corpus", default=None,
        help="word list file (one word per line) to sample labels from",
    )
    p.add_argument("--max-len", type=int, default=25, help="label length cap")
    p.add_argument(
        "--epochs", type=int, default=150,
        help="epochs written into the generated config (the 46M flagship "
        "needs ~100+ epochs on 2k lines before attention aligns)",
    )
    args = p.parse_args(argv)

    if args.chars == "homoglyph-free":
        alphabet = HOMOGLYPH_FREE_ALPHABET
    else:
        alphabet = args.chars if args.chars else GENERATION_ALPHABET
    corpus = None
    if args.corpus:
        with open(args.corpus, encoding="utf-8") as f:
            corpus = [w.strip() for w in f if w.strip()]
        if not corpus:
            p.error(f"--corpus {args.corpus} contains no words")
        bad = sorted({c for w in corpus for c in w if c not in set(alphabet)})
        if bad:
            alphabet = alphabet + "".join(bad)
            print(f"[synth] extended alphabet with corpus chars: {''.join(bad)!r}")

    fonts = discover_fonts()
    if not fonts:
        print("ERROR: no usable TrueType fonts found on this host", file=sys.stderr)
        return 2
    os.makedirs(args.out, exist_ok=True)

    common = dict(
        img_h=args.img_h, difficulty=args.difficulty, alphabet=alphabet,
        corpus=corpus, fonts=fonts, max_len=args.max_len,
    )
    train_csv, train_root = generate_dataset(
        os.path.join(args.out, "train"), args.n_train, seed=args.seed, **common
    )
    # Distinct seed stream: val must not duplicate train labels/images.
    val_csv, val_root = generate_dataset(
        os.path.join(args.out, "val"), args.n_val, seed=args.seed + 1_000_003, **common
    )
    # Headered twin for the eval CLI (same images; just re-write the CSV).
    eval_csv = os.path.join(val_root, "eval.csv")
    with open(val_csv, encoding="utf-8") as src, open(
        eval_csv, "w", encoding="utf-8", newline="\n"
    ) as dst:
        dst.write("filename,text\n")
        dst.write(src.read())

    charset_path = os.path.join(args.out, "charset.txt")
    n_tokens = write_charset(charset_path, alphabet)

    config = {
        "train_csvs": [os.path.join(args.out, "train", "labels.csv")],
        "train_roots": [os.path.join(args.out, "train")],
        "val_csvs": [os.path.join(args.out, "val", "labels.csv")],
        "val_roots": [os.path.join(args.out, "val")],
        "charset_path": charset_path,
        "img_h": 32,
        "img_w": 128,
        "max_len": args.max_len,
        "batch_size": 128,
        # The flagship 46M-param model needs thousands of steps before the
        # attention aligns on random-string labels: 20 epochs on 2k lines
        # measured acc=0.0 on the real chip; the round-2 demo needed ~200
        # epochs to reach val acc 0.95 (PERF.md end-to-end demos).
        "epochs": args.epochs,
        "lr": 1e-3,
        "scheduler": "CosineAnnealingLR",
        "head": "attention",
        "eval_every": 5,
        "exp_dir": os.path.join(args.out, "exp"),
        # TPU-native input recipe: augmentation ON DEVICE (ops/augment.py
        # twin of the host pipeline), leaving the host transform a
        # deterministic ResizeAndPad — which the disk transform cache can
        # then memmap, so epochs after the first feed at memcpy speed
        # instead of re-running cv2 (394 img/s uncached on a 1-core host
        # vs the chip's 20k+).
        "device_augment": True,
        "cache_dir": os.path.join(args.out, "cache"),
        "num_workers": 0,
    }
    config_path = os.path.join(args.out, "config.json")
    with open(config_path, "w", encoding="utf-8") as f:
        json.dump(config, f, indent=2, ensure_ascii=False)

    print(
        f"[synth] wrote {args.n_train} train + {args.n_val} val lines "
        f"({args.difficulty}, {len(fonts)} fonts, {n_tokens}-token charset)"
    )
    print(f"[synth] train: {train_csv}")
    print(f"[synth] val:   {val_csv}  (eval CLI form: {eval_csv})")
    print(f"[synth] next:  python example_train.py {config_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
