"""Long-line decode debugging visualizer.

Renders, for each input image, a 3-band PNG:

1. the height-normalized line with TILE boundaries (blue) and junction
   CUTS (red, in pixel space — where the stitcher hands off between tiles)
2. the per-frame CTC argmax strip (grey = blank, green = character) with
   the hybrid SEGMENT spans (orange boxes) from ``segment_spans``
3. the decoded texts: ``ctc_long`` (stitched collapse) and — when the
   checkpoint carries both heads — ``hybrid`` with one box per segment

This is the debugging companion to `tools/long_line_demo.py` (which
measures CER): when a long line decodes wrong, this shows WHERE — a cut
through a character, an over-merged segment, a truncated tile.

Usage:

    JAX_PLATFORMS=cpu python tools/long_line_viz.py \
        --model exp1/best_acc_weights.msgpack --charset charset.txt \
        --img-h 32 --img-w 64 --out viz.png line1.png [line2.png ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLUE = (64, 96, 255)
RED = (255, 64, 64)
GREEN = (64, 200, 96)
ORANGE = (255, 160, 32)
GREY = (180, 180, 180)


def annotate_one(ocr, rgb: np.ndarray, tile_w: int, overlap: int) -> np.ndarray:
    """One height-normalized line -> stacked annotation bands (RGB)."""
    import cv2

    from rcnn_ocr_tpu.data.transforms import ResizeAndPad
    from rcnn_ocr_tpu.long_lines import (
        extract_tile_frames,
        height_normalize,
        long_line_spans,
        plan_tiles,
        segment_spans,
        stitch_frames,
    )

    pad_one = ResizeAndPad(img_h=ocr.img_h, img_w=tile_w)
    tiles, plans = plan_tiles([rgb], ocr.img_h, tile_w, overlap, pad_one)
    first, starts = plans[0]
    kernel = ocr.tile_kernel(prune_k=8)
    vals, idx = extract_tile_frames(
        tiles, ocr._round_batch(8),
        lambda b: kernel(ocr.variables, ocr._device_batch(b)),
    )
    frames_t = vals.shape[1]
    stride = tile_w / frames_t
    norm = height_normalize(rgb, ocr.img_h)
    full_w = norm.shape[1]

    # band 1: the line + tile boundaries + junction cuts
    band1 = norm.copy()
    for s in starts:
        cv2.line(band1, (s, 0), (s, ocr.img_h - 1), BLUE, 1)
        cv2.line(band1, (min(s + tile_w, full_w) - 1, 0),
                 (min(s + tile_w, full_w) - 1, ocr.img_h - 1), BLUE, 1)
    spans = long_line_spans(starts, tile_w, frames_t)
    for j, (t, a, b) in enumerate(spans[:-1]):
        cut_px = int((starts[j] / stride + b) * stride)
        cv2.line(band1, (cut_px, 0), (cut_px, ocr.img_h - 1), RED, 1)

    # band 2: per-frame argmax strip + hybrid segments
    _, i_cat = stitch_frames(vals, idx, first, starts, tile_w, frames_t)
    blank = ocr.charset.ctc_blank_id
    strip_h = 14
    band2 = np.full((strip_h, full_w, 3), 255, np.uint8)
    for f, cid in enumerate(i_cat[:, 0]):
        x0, x1 = int(f * stride), min(int((f + 1) * stride), full_w)
        band2[2:-2, x0:x1] = GREY if cid == blank else GREEN
    segs = segment_spans(i_cat[:, 0], blank, max_frames=frames_t)
    for s, e in segs:
        x0, x1 = int(s * stride), min(int(round(e * stride)), full_w) - 1
        cv2.rectangle(band2, (x0, 0), (x1, strip_h - 1), ORANGE, 1)

    # band 3: decoded texts
    text_h = 36
    band3 = np.full((text_h, full_w, 3), 255, np.uint8)
    ctc_text = ocr.predict_ctc_long(rgb, tile_w=tile_w, overlap=overlap)
    cv2.putText(band3, f"ctc_long: {ctc_text}", (2, 14),
                cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 0, 0), 1, cv2.LINE_AA)
    if ocr.model.with_attention_head and ocr.model.with_ctc_head:
        hyb = ocr.predict_hybrid_long(rgb, tile_w=tile_w, overlap=overlap)
        cv2.putText(band3, f"hybrid:   {hyb}", (2, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 0, 0), 1, cv2.LINE_AA)

    return np.concatenate([band1, band2, band3], axis=0)


def main() -> int:
    import cv2

    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.long_lines import resolve_tiling

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("images", nargs="+", help="line image files")
    p.add_argument("--model", required=True)
    p.add_argument("--charset", required=True)
    p.add_argument("--img-h", type=int, default=None)
    p.add_argument("--img-w", type=int, default=None)
    p.add_argument("--tile-w", type=int, default=None)
    p.add_argument("--overlap", type=int, default=None)
    p.add_argument("--out", default="long_line_viz.png")
    args = p.parse_args()

    ocr = OCRInference(
        args.model, args.charset, img_h=args.img_h, img_w=args.img_w,
        verbose=False,
    )
    tile_w, overlap = resolve_tiling(ocr.img_w, args.tile_w, args.overlap)

    panels = []
    for path in args.images:
        rgb = ocr._to_rgb(path)
        panels.append(annotate_one(ocr, rgb, tile_w, overlap))
    w = max(pnl.shape[1] for pnl in panels)
    padded = [
        np.pad(pnl, ((0, 6), (0, w - pnl.shape[1]), (0, 0)),
               constant_values=255)
        for pnl in panels
    ]
    grid = np.concatenate(padded, axis=0)
    cv2.imwrite(args.out, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    print(f"Wrote {args.out} ({grid.shape[1]}x{grid.shape[0]}, "
          f"{len(panels)} line(s), tile_w={tile_w}, overlap={overlap})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
