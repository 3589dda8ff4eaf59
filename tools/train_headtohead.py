"""Head-to-head trainer certification: reference torch stack vs this framework.

Inference-side parity (torch-checkpoint import, 128/128 identical decodes —
PARITY.md) proves the *model function*.  This tool certifies the *trainer*:
it trains BOTH stacks on ONE identical synthetic corpus with the reference's
shipped hyperparameters (`/root/reference/training/train.py:179-320`:
Adam lr=1e-3, CrossEntropyLoss ignore_index=PAD, ReduceLROnPlateau
factor=0.5 patience=3, batch 32) and compares held-out exact-match accuracy
(VA), mirroring the reference README's augmentation-on / augmentation-off
pair (`/root/reference/README.md:4-6`).

The torch side runs the REAL reference ``run_training`` loop (imported from
`/root/reference/training/train.py`) with two stubs: ``albumentations``
(not installed here — `tools/albumentations_stub.py`, backed by this
framework's first-party ops so both stacks see the same augmentation
distribution) and ``torchvision.ops.DropBlock2d`` (identity at p=0, the
reference default).  The JAX side runs this framework's ``run_training``
on the same CSVs, charset, and hyperparameters.

Scale note: this host exposes ONE CPU core, so the head-to-head runs the
exact reference architecture (width 1.0) at reduced geometry/vocabulary
(32x64 images, hidden 128, 36-char alphabet, short labels).  The full-scale
TPU accuracy run is a separate stage (``jax-tpu``) on a larger corpus.

Usage (each stage is resumable / independently runnable)::

    python tools/train_headtohead.py --out /tmp/h2h --stage gen
    python tools/train_headtohead.py --out /tmp/h2h --stage torch-aug
    python tools/train_headtohead.py --out /tmp/h2h --stage torch-noaug
    python tools/train_headtohead.py --out /tmp/h2h --stage jax-aug
    python tools/train_headtohead.py --out /tmp/h2h --stage jax-noaug
    python tools/train_headtohead.py --out /tmp/h2h --stage report
    python tools/train_headtohead.py --out /tmp/h2h --stage all   # everything

Results land in ``OUT/results.json`` and a printed markdown table.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"

# Reference-default augmentation knobs (/root/reference/data/transforms.py:160-182)
AUG_ON = {
    "shift_limit": 0.03, "scale_limit": 0.08, "rotate_limit": 3,
    "p_ShiftScaleRotate": 0.3, "brightness_limit": 0.2, "contrast_limit": 0.2,
    "p_BrightnessContrast": 0.3, "invert_p": 0.0,
}
AUG_OFF = {
    "shift_limit": 0.0, "scale_limit": 0.0, "rotate_limit": 0,
    "p_ShiftScaleRotate": 0.0, "brightness_limit": 0.0, "contrast_limit": 0.0,
    "p_BrightnessContrast": 0.0, "invert_p": 0.0,
}


def _common_cfg(args, out: str, aug: bool) -> dict:
    data = os.path.join(out, "data")
    return {
        "train_csvs": [os.path.join(data, "train", "labels.csv")],
        "train_roots": [os.path.join(data, "train")],
        "val_csvs": [os.path.join(data, "val", "labels.csv")],
        "val_roots": [os.path.join(data, "val")],
        "charset_path": os.path.join(data, "charset.txt"),
        "img_h": args.img_h,
        "img_w": args.img_w,
        "max_len": args.max_len,
        "hidden_size": args.hidden,
        "batch_size": args.batch,
        "epochs": args.epochs,
        "lr": 1e-3,
        "optimizer": "Adam",
        "scheduler": "ReduceLROnPlateau",
        "weight_decay": 0.0,
        "seed": args.seed,
        "eval_every": args.eval_every,
        "num_workers": 0,
        **(AUG_ON if aug else AUG_OFF),
    }


def stage_gen(args, out: str) -> None:
    """Render the shared corpus once (pure function of the seed)."""
    from rcnn_ocr_tpu.data.synthetic import discover_fonts, generate_dataset

    # `--n-fonts 1` makes the CPU-scale run convergence-feasible (the
    # budget is ~800 optimizer steps; a multi-font corpus plateaus before
    # the attention alignment cliff at that budget — measured round 5)
    fonts = discover_fonts()
    if args.n_fonts:
        fonts = fonts[: args.n_fonts]
    data = os.path.join(out, "data")
    for split, n, seed in (
        ("train", args.n_train, args.seed), ("val", args.n_val, args.seed + 1)
    ):
        root = os.path.join(data, split)
        if os.path.exists(os.path.join(root, "labels.csv")):
            print(f"[gen] {split}: exists, skipping")
            continue
        t0 = time.time()
        generate_dataset(
            root, n, seed=seed, img_h=args.img_h, difficulty=args.difficulty,
            alphabet=ALPHABET, max_len=args.max_len, fonts=fonts,
        )
        print(f"[gen] {split}: {n} lines in {time.time() - t0:.0f}s")
    charset_path = os.path.join(data, "charset.txt")
    if not os.path.exists(charset_path):
        from rcnn_ocr_tpu.vocab.charset import EOS_TOKEN, PAD_TOKEN, SOS_TOKEN

        # " " is in the charset because sample_texts joins words with
        # spaces — without it BOTH stacks' strict charset screening drops
        # every multi-word label (measured: 91/512)
        tokens = [PAD_TOKEN, SOS_TOKEN, EOS_TOKEN] + list(ALPHABET) + [" "]
        with open(charset_path, "w", encoding="utf-8") as f:
            f.write("\n".join(tokens) + "\n")
        print(f"[gen] charset: {len(tokens)} tokens")


def _install_torch_stubs(seed: int) -> None:
    """albumentations (first-party-backed) + torchvision.DropBlock2d stubs."""
    import torch

    import tools.albumentations_stub as astub

    astub.install()
    astub.seed(seed)
    if "jiwer" not in sys.modules:
        # reference metrics import `jiwer.wer` (/root/reference/training/
        # metrics.py:2); back it with this framework's first-party WER
        from rcnn_ocr_tpu.training.metrics import word_error_rate

        jiwer = types.ModuleType("jiwer")
        jiwer.wer = word_error_rate
        sys.modules["jiwer"] = jiwer
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        class DropBlock2d(torch.nn.Identity):
            # reference default dropblock_p=0.0 -> identity is exact
            def __init__(self, p=0.0, block_size=5):
                super().__init__()

        tv_ops.DropBlock2d = DropBlock2d
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops

    # the reference targets an older torch whose ReduceLROnPlateau still
    # accepted `verbose=` (/root/reference/training/train.py:305); this
    # image's torch removed it — shim it off (no behavioral difference)
    import torch.optim.lr_scheduler as lrs

    try:
        lrs.ReduceLROnPlateau(torch.optim.SGD([torch.zeros(1, requires_grad=True)], lr=1.0), verbose=False)
    except TypeError:
        _Orig = lrs.ReduceLROnPlateau

        class _PlateauCompat(_Orig):
            def __init__(self, *a, verbose=False, **kw):
                super().__init__(*a, **kw)

        lrs.ReduceLROnPlateau = _PlateauCompat


def stage_torch(args, out: str, aug: bool) -> None:
    """The REAL reference run_training loop, on CPU, on the shared corpus."""
    _install_torch_stubs(args.seed)
    sys.path.insert(0, args.reference)
    try:
        from training.train import Config, run_training  # reference import
    except ImportError as e:
        raise SystemExit(f"cannot import reference trainer: {e}")

    tag = "torch-aug" if aug else "torch-noaug"
    exp_dir = os.path.join(out, tag)
    cfg_dict = _common_cfg(args, out, aug)
    cfg_dict["exp_dir"] = exp_dir
    if args.resume:
        cfg_dict["resume_path"] = os.path.join(exp_dir, "last_ckpt.pth")
    os.makedirs(exp_dir, exist_ok=True)
    cfg_path = os.path.join(out, f"{tag}_config.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(cfg_dict, f, indent=1)
    t0 = time.time()
    run_training(Config(cfg_path), device="cpu")
    print(f"[{tag}] done in {(time.time() - t0) / 60:.1f} min")


def stage_jax(args, out: str, aug: bool, tpu: bool = False) -> None:
    """This framework's run_training on the identical corpus + hyperparams."""
    from rcnn_ocr_tpu.training.config import Config
    from rcnn_ocr_tpu.training.train import run_training

    tag = ("jax-tpu" if tpu else ("jax-aug" if aug else "jax-noaug"))
    exp_dir = os.path.join(out, tag)
    cfg_dict = _common_cfg(args, out, aug)
    cfg_dict.update({
        "exp_dir": exp_dir,
        "head": "attention",          # the reference's only head
        "width_mult": 1.0,            # exact reference architecture
        # CPU amp is disabled in the torch reference run (no CUDA), so the
        # fair CPU comparison is fp32 vs fp32; the TPU stage uses the
        # production bf16 path.
        "compute_dtype": "bfloat16" if tpu else "float32",
        "use_pallas": False,
    })
    if args.resume:
        cfg_dict["resume_path"] = os.path.join(exp_dir, "last_ckpt.msgpack")
    os.makedirs(exp_dir, exist_ok=True)
    cfg_path = os.path.join(out, f"{tag}_config.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(cfg_dict, f, indent=1)
    t0 = time.time()
    run_training(Config(cfg_path))
    print(f"[{tag}] done in {(time.time() - t0) / 60:.1f} min")


def _best_row(exp_dir: str) -> dict:
    """Best-VA row from a metrics_epoch.csv (both stacks share the layout)."""
    path = os.path.join(exp_dir, "metrics_epoch.csv")
    if not os.path.exists(path):
        return {}
    best = {}
    last = {}
    with open(path, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            if row.get("val_acc") in (None, "", "skipped"):
                continue
            row = {k: row[k] for k in ("epoch", "train_loss", "val_loss",
                                       "val_acc", "val_cer", "val_wer")}
            last = row
            if not best or float(row["val_acc"]) > float(best["val_acc"]):
                best = row
    return {"best": best, "last": last}


def stage_report(args, out: str) -> None:
    tags = ["torch-aug", "torch-noaug", "jax-aug", "jax-noaug", "jax-tpu"]
    results = {}
    for tag in tags:
        r = _best_row(os.path.join(out, tag))
        if r:
            results[tag] = r
    path = os.path.join(out, "results.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=1)
    print(f"[report] -> {path}")
    print("| run | best VA | @epoch | best CER | last VA |")
    print("|---|---|---|---|---|")
    for tag, r in results.items():
        b, l = r.get("best", {}), r.get("last", {})
        if b:
            print(
                f"| {tag} | {float(b['val_acc']):.4f} | {b['epoch']} "
                f"| {float(b['val_cer']):.4f} | {float(l['val_acc']):.4f} |"
            )


STAGES = ["gen", "torch-aug", "torch-noaug", "jax-aug", "jax-noaug",
          "jax-tpu", "report", "all"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--stage", choices=STAGES, default="all")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--n-train", type=int, default=1536)
    ap.add_argument("--n-val", type=int, default=256)
    ap.add_argument("--img-h", type=int, default=32)
    ap.add_argument("--img-w", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--eval-every", type=int, default=2)
    ap.add_argument("--max-len", type=int, default=7)
    ap.add_argument("--difficulty", default="clean")
    ap.add_argument("--n-fonts", type=int, default=0,
                    help="restrict the rendering font pool (0 = all)")
    ap.add_argument(
        "--resume", action="store_true",
        help="continue the stage from its exp dir's last checkpoint "
        "(budget-extension runs; --epochs sets the NEW total)",
    )
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)

    if args.stage == "all":
        # each training stage in its own subprocess (torch/jax isolation;
        # JAX_PLATFORMS=cpu keeps every run off the single TPU tunnel)
        base = [a for a in (argv if argv is not None else sys.argv[1:])
                if a not in ("--stage", "all")]
        for st in ["gen", "torch-aug", "torch-noaug", "jax-aug", "jax-noaug",
                   "report"]:
            env = dict(os.environ, JAX_PLATFORMS="cpu",
                       PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), *base, "--stage", st],
                env=env,
            )
            if rc != 0:
                print(f"[all] stage {st} FAILED rc={rc}")
                return rc
        return 0

    if args.stage == "gen":
        stage_gen(args, out)
    elif args.stage == "torch-aug":
        stage_torch(args, out, aug=True)
    elif args.stage == "torch-noaug":
        stage_torch(args, out, aug=False)
    elif args.stage == "jax-aug":
        stage_jax(args, out, aug=True)
    elif args.stage == "jax-noaug":
        stage_jax(args, out, aug=False)
    elif args.stage == "jax-tpu":
        stage_jax(args, out, aug=True, tpu=True)
    elif args.stage == "report":
        stage_report(args, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
