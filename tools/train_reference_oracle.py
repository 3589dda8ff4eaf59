"""Train the REFERENCE torch model on synthetic data to produce a trained oracle.

Round-1 parity evidence compared random-weight models only; a trained model's
near-tie logits are where bf16/XLA numerics could flip argmaxes.  This script
closes that gap: it trains the reference architecture
(`/root/reference/model/model.py:166`) on CPU on a synthetic line-OCR set,
saves the checkpoint in all three reference ``.pth`` layouts
(`/root/reference/inference.py:67-75`), and writes a held-out labels CSV —
ready for ``tools/parity_check.py --ckpt ... --csv ...`` to certify
greedy-decode string agreement between torch and this framework with
*trained* weights.

Usage:
    python tools/train_reference_oracle.py --out artifacts/oracle \
        [--steps 600] [--batch 16] [--hidden 128] [--max-length 8]

Artifacts land in ``--out`` (gitignored: ~170 MB of fp32 weights); the
committed evidence is the PARITY.md row + the slow test in
``tests/test_torch_parity.py`` that re-runs a short version end-to-end.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time
import types

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"


def render_line(
    text: str, h: int, w: int, rng: np.random.Generator
) -> np.ndarray:
    """Draw one text line with mild random geometry/noise (RGB uint8)."""
    img = np.full((h, w, 3), 255, dtype=np.uint8)
    scale = float(rng.uniform(0.45, 0.7))
    x0 = int(rng.integers(1, 6))
    y0 = h - int(rng.integers(6, 12))
    cv2.putText(
        img, text, (x0, y0), cv2.FONT_HERSHEY_SIMPLEX, scale, (0, 0, 0),
        1, cv2.LINE_AA,
    )
    noise = rng.integers(-10, 10, size=img.shape, dtype=np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def make_split(
    root: str, n: int, rng: np.random.Generator, h: int, w: int, max_chars: int
) -> str:
    """Render ``n`` labelled lines into ``root``; returns the CSV path."""
    os.makedirs(root, exist_ok=True)
    csv_path = os.path.join(root, "labels.csv")
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        writer = csv.writer(f)
        for i in range(n):
            k = int(rng.integers(1, max_chars + 1))
            label = "".join(rng.choice(list(ALPHABET), size=k))
            img = render_line(label, h, w, rng)
            fname = f"line_{i:05d}.png"
            cv2.imwrite(
                os.path.join(root, fname), cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            )
            writer.writerow([fname, label])
    return csv_path


def build_reference_model(num_classes: int, hidden: int):
    """Import and build the reference RCNN (torchvision stubbed)."""
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        class DropBlock2d(torch.nn.Identity):
            def __init__(self, p=0.0, block_size=5):
                super().__init__()

        tv_ops.DropBlock2d = DropBlock2d
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops

    sys.path.insert(0, "/root/reference")
    try:
        from model.model import RCNN  # noqa: PLC0415
    finally:
        sys.path.remove("/root/reference")

    return RCNN(
        num_classes=num_classes, hidden_size=hidden,
        sos_id=1, eos_id=2, pad_id=0, blank_id=None,
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="artifacts/oracle")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--img-h", type=int, default=32)
    ap.add_argument("--img-w", type=int, default=96)
    ap.add_argument("--max-length", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=400)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--resume-from", default=None,
        help="bare state_dict .pth to continue training from (reuses --out data)",
    )
    ap.add_argument(
        "--charset", default=None,
        help="token-per-line charset file (e.g. configs/charset.txt) — trains the "
        "oracle at that production vocab size; labels are drawn from the "
        "renderable cv2.putText subset (ASCII alnum) present in the charset",
    )
    args = ap.parse_args()

    import torch
    import torch.nn.functional as F

    from rcnn_ocr_tpu.vocab.charset import (
        Charset, decode_tokens, pack_attention_targets,
    )

    torch.manual_seed(args.seed)
    rng = np.random.default_rng(args.seed)
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)

    # charset file: either the supplied production charset, or a minimal
    # specials + alphabet file, one token per line
    global ALPHABET
    if args.charset:
        tokens = [
            ln.rstrip("\n") for ln in open(args.charset, encoding="utf-8")
            if ln.rstrip("\n")
        ]
        charset_path = os.path.abspath(args.charset)
        # cv2.putText only renders ASCII; train labels over the charset's
        # renderable alnum subset (the model still has the full vocab head)
        renderable = [t for t in tokens if len(t) == 1 and t.isascii() and t.isalnum()]
        if not renderable:
            raise SystemExit(f"charset {args.charset} has no renderable ASCII tokens")
        ALPHABET = "".join(renderable)
    else:
        tokens = ["<PAD>", "<SOS>", "<EOS>"] + list(ALPHABET)
        charset_path = os.path.join(out, "charset.txt")
        with open(charset_path, "w", encoding="utf-8") as f:
            f.write("\n".join(tokens) + "\n")
    charset = Charset.from_tokens(tokens)

    train_csv = os.path.join(out, "train", "labels.csv")
    val_csv = os.path.join(out, "val", "labels.csv")
    if args.resume_from and os.path.exists(train_csv):
        print("reusing existing synthetic splits")
    else:
        train_csv = make_split(
            os.path.join(out, "train"), args.n_train, rng, args.img_h, args.img_w,
            args.max_length - 2,
        )
        val_csv = make_split(
            os.path.join(out, "val"), args.n_val, rng, args.img_h, args.img_w,
            args.max_length - 2,
        )

    rows = list(csv.reader(open(train_csv, encoding="utf-8")))
    train_root = os.path.dirname(train_csv)
    images = np.stack([
        cv2.cvtColor(
            cv2.imread(os.path.join(train_root, r[0])), cv2.COLOR_BGR2RGB
        ).astype(np.float32) / 255.0
        for r in rows
    ])  # [N, H, W, 3] in [0, 1]
    images = (images - 0.5) / 0.5  # reference normalize (mean/std 0.5)
    labels = [r[1] for r in rows]
    text_in, target_y, _ = pack_attention_targets(
        labels, charset.stoi, args.max_length
    )

    model = build_reference_model(charset.num_classes, args.hidden)
    if args.resume_from:
        model.load_state_dict(torch.load(args.resume_from, map_location="cpu"))
        print(f"resumed weights from {args.resume_from}")
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)

    x_all = torch.from_numpy(images.transpose(0, 3, 1, 2))
    tin_all = torch.from_numpy(text_in.astype(np.int64))
    ty_all = torch.from_numpy(target_y.astype(np.int64))

    order = rng.permutation(len(labels))
    pos = 0
    t0 = time.time()
    for step in range(args.steps):
        if pos + args.batch > len(order):
            order = rng.permutation(len(labels))
            pos = 0
        idx = torch.from_numpy(order[pos : pos + args.batch].copy())
        pos += args.batch

        logits = model(
            x_all[idx], text=tin_all[idx], is_train=True,
            batch_max_length=args.max_length,
        )
        loss = F.cross_entropy(
            logits.reshape(-1, charset.num_classes), ty_all[idx].reshape(-1),
            ignore_index=charset.pad_id,
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 25 == 0 or step == args.steps - 1:
            print(
                f"step {step:4d}  loss {float(loss.detach()):.4f}  "
                f"({time.time() - t0:.0f}s)", flush=True,
            )

    # held-out exact-match accuracy of the trained torch model
    model.eval()
    val_rows = list(csv.reader(open(val_csv, encoding="utf-8")))
    val_root = os.path.dirname(val_csv)
    val_images = np.stack([
        cv2.cvtColor(
            cv2.imread(os.path.join(val_root, r[0])), cv2.COLOR_BGR2RGB
        ).astype(np.float32) / 255.0
        for r in val_rows
    ])
    val_images = (val_images - 0.5) / 0.5
    with torch.no_grad():
        val_logits = model(
            torch.from_numpy(val_images.transpose(0, 3, 1, 2)),
            is_train=False, batch_max_length=args.max_length,
        ).numpy()
    preds = [
        decode_tokens(
            row, list(charset.itos), charset.pad_id, charset.eos_id,
            charset.blank_id,
        )
        for row in val_logits.argmax(-1)
    ]
    correct = sum(1 for p, r in zip(preds, val_rows) if p == r[1])
    acc = correct / len(val_rows)
    print(f"heldout exact-match: {correct}/{len(val_rows)} ({acc:.2%})")

    # save all three reference .pth layouts
    sd = model.state_dict()
    torch.save(sd, os.path.join(out, "oracle_bare.pth"))
    torch.save(
        {"model_state_dict": sd, "hidden_size": args.hidden},
        os.path.join(out, "oracle_legacy.pth"),
    )
    torch.save(
        {
            "model_state": sd,
            "itos": list(charset.itos),
            "stoi": dict(charset.stoi),
            "config": {
                "hidden_size": args.hidden,
                "img_h": args.img_h,
                "img_w": args.img_w,
                "max_length": args.max_length,
            },
            "heldout_exact_match": acc,
        },
        os.path.join(out, "oracle_full.pth"),
    )
    print(f"saved oracle checkpoints + charset + val CSV under {out}")
    print(
        "next: python tools/parity_check.py "
        f"--ckpt {out}/oracle_full.pth --charset {charset_path} "
        f"--csv {val_csv} --root {val_root} "
        f"--img-h {args.img_h} --img-w {args.img_w} --n {len(val_rows)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
