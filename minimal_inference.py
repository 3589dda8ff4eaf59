"""Minimal OCR inference example — mirror of the reference's
`minimal_inference.py`: load a checkpoint + charset, predict one image.

Works with this framework's msgpack checkpoints *and* the reference's
.pth checkpoints (imported on the fly).  Flags mirror the eval CLI:
``--quantize`` runs the int8 serving path (the benchmark headline
configuration), ``--serving`` the on-device-preprocess pipeline,
``--width-buckets 64,128`` or ``auto[:K]`` bucketed decode, and
``--img-h/--img-w`` override the checkpoint's training size.
"""

import argparse

from rcnn_ocr_tpu.inference import OCRInference


def parse_buckets(spec):
    if spec is None or spec.startswith("auto"):
        return spec
    return [int(b) for b in spec.split(",") if b]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", nargs="?", default="exp1/best_acc_weights.msgpack")
    ap.add_argument("charset", nargs="?", default="configs/charset.txt")
    ap.add_argument("image", nargs="?", default="test.png")
    ap.add_argument("--quantize", action="store_true", help="int8 serving path")
    ap.add_argument(
        "--serving", action="store_true",
        help="predict_serving: uint8 letterbox + on-device preprocess",
    )
    ap.add_argument(
        "--width-buckets", default=None,
        help="comma list (64,128) or auto[:K] — decode at bucketed widths",
    )
    ap.add_argument("--img-h", type=int, default=None)
    ap.add_argument("--img-w", type=int, default=None)
    ap.add_argument(
        "--beam-width", type=int, default=None,
        help="attention beam search with K hypotheses (default: greedy)",
    )
    ap.add_argument(
        "--lm", default=None, metavar="LM.npz",
        help="bigram LM for beam shallow fusion (tools/train_lm.py)",
    )
    ap.add_argument(
        "--lm-weight", type=float, default=0.0,
        help="fusion weight; requires --beam-width > 1",
    )
    ap.add_argument(
        "--length-penalty", type=float, default=0.0,
        help="beam rank normalization: score / len**p; requires --beam-width > 1",
    )
    args = ap.parse_args()

    ocr = OCRInference(
        args.model, args.charset, device="auto", quantize=args.quantize,
        img_h=args.img_h, img_w=args.img_w,
        width_buckets=parse_buckets(args.width_buckets),
        lm=args.lm,
    )
    beam = args.beam_width is not None and args.beam_width > 1
    if args.serving:
        text = ocr.predict_serving(
            args.image, canvas="auto",
            method="attention_beam" if beam else "attention",
            beam_width=args.beam_width or 16,
            # pass through unmasked: predict_serving refuses the knob
            # without a beam (masking silently dropped it — the
            # silently-dropped-knob rule)
            length_penalty=args.length_penalty,
            lm_weight=args.lm_weight,
        )
    else:
        text = ocr.predict(
            args.image, beam_width=args.beam_width,
            length_penalty=args.length_penalty, lm_weight=args.lm_weight,
        )
    print(f"Result: '{text}'")


if __name__ == "__main__":
    main()
