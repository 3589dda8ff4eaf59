"""Decode-parity checker: this framework vs the reference PyTorch model.

Given a reference-format ``.pth`` checkpoint (any of the three layouts),
runs the same inputs through (a) this framework's imported JAX model and
(b) the reference architecture in torch-CPU (when the reference repo and
torch are available), and reports logit closeness + greedy-decode string
agreement.  This is how VA parity (BASELINE.md: >= 0.912 with the
reference checkpoint) is certified without the original dataset: if every
decoded string matches the reference model's output, the val accuracy is
bit-for-bit the reference's.

Usage:
    python tools/parity_check.py --ckpt model.pth --charset charset.txt \
        [--csv labels.csv --root images/] [--img-h 32 --img-w 128] \
        [--n 64] [--reference /root/reference]

Without --csv, random inputs are used (still a full architecture/weights
check); with --csv, real line images are compared end-to-end.
"""

from __future__ import annotations

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_reference_model(reference_dir: str, num_classes: int, hidden_size: int,
                         sos_id: int, eos_id: int, pad_id: int, blank_id, state_dict):
    """Instantiate the reference torch model (stubbing torchvision)."""
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

    sys.path.insert(0, reference_dir)
    try:
        from model.model import RCNN as TorchRCNN  # noqa: PLC0415
    finally:
        sys.path.remove(reference_dir)

    tmodel = TorchRCNN(
        num_classes=num_classes, hidden_size=hidden_size,
        sos_id=sos_id, eos_id=eos_id, pad_id=pad_id, blank_id=blank_id,
    )
    tmodel.load_state_dict(state_dict)
    tmodel.eval()
    return tmodel


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="reference .pth checkpoint")
    ap.add_argument("--charset", required=True)
    ap.add_argument("--csv", default=None, help="optional labels CSV (filename,text)")
    ap.add_argument("--root", default=None, help="images folder for --csv")
    ap.add_argument("--img-h", type=int, default=32)
    ap.add_argument("--img-w", type=int, default=128)
    ap.add_argument("--max-length", type=int, default=25)
    ap.add_argument("--n", type=int, default=64, help="number of samples")
    ap.add_argument("--reference", default="/root/reference",
                    help="path to the reference repo (for the torch oracle)")
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"],
                    help="framework compute dtype (torch oracle stays fp32)")
    args = ap.parse_args()

    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # oracle runs on CPU anyway
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.vocab.charset import decode_tokens

    dtype = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16
    ocr = OCRInference(
        args.ckpt, args.charset, img_h=args.img_h, img_w=args.img_w,
        dtype=dtype, verbose=False,
    )
    cs = ocr.charset

    # inputs
    if args.csv:
        import csv as csv_mod

        rows = list(csv_mod.reader(open(args.csv, encoding="utf-8")))
        if rows and rows[0] and rows[0][0].strip().lower() in {
            "file", "filename", "image", "path", "img", "name"
        }:
            rows = rows[1:]
        rows = rows[: args.n]
        from rcnn_ocr_tpu.data.transforms import imread_cv2

        raw = [imread_cv2(os.path.join(args.root, r[0])) for r in rows]
        batch = np.stack([ocr._preprocess(img) for img in raw])
    else:
        rng = np.random.default_rng(0)
        batch = rng.normal(size=(args.n, args.img_h, args.img_w, 3)).astype(np.float32)

    # ours
    run = ocr._greedy_fn(args.max_length + 1)
    pred, _ = run(ocr.variables, jnp.asarray(batch))
    ours = [
        decode_tokens(row, list(cs.itos), cs.pad_id, cs.eos_id, cs.blank_id)
        for row in np.asarray(pred)
    ]

    # reference oracle
    if not os.path.isdir(args.reference):
        print("reference repo not found — skipping oracle comparison")
        for i, text in enumerate(ours[:10]):
            print(f"  {i}: '{text}'")
        return 0

    import torch

    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state" in blob:
        sd = blob["model_state"]
    elif isinstance(blob, dict) and "model_state_dict" in blob:
        sd = blob["model_state_dict"]
    else:
        sd = blob
    tmodel = load_reference_model(
        args.reference, cs.num_classes, ocr.model.hidden_size,
        cs.sos_id, cs.eos_id, cs.pad_id, cs.blank_id, sd,
    )
    t_in = batch
    if t_in.dtype == np.uint8:
        # the framework ships resize-padded uint8 and normalizes on device;
        # the torch oracle needs the same normalize applied host-side
        t_in = (t_in.astype(np.float32) / 255.0 - 0.5) / 0.5
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(t_in.transpose(0, 3, 1, 2)),
            is_train=False, batch_max_length=args.max_length,
        ).numpy()
    theirs = [
        decode_tokens(row, list(cs.itos), cs.pad_id, cs.eos_id, cs.blank_id)
        for row in t_logits.argmax(-1)
    ]

    agree = sum(1 for a, b in zip(ours, theirs) if a == b)
    print(f"decode agreement: {agree}/{len(ours)} ({agree / len(ours):.2%})")
    for i, (a, b) in enumerate(zip(ours, theirs)):
        if a != b:
            print(f"  MISMATCH {i}: ours='{a}' reference='{b}'")
    return 0 if agree == len(ours) else 1


if __name__ == "__main__":
    raise SystemExit(main())
