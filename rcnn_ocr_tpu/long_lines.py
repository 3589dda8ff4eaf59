"""Unbounded-width (long-line) decoding: tile, trim, stitch.

Every fixed-width path (here and in the reference,
`/root/reference/data/transforms.py:62-120`) squashes the line into one
canvas — a 4000 px line at ``img_w=512`` loses ~8x of its horizontal
resolution and the accuracy with it.  CTC frames are time-aligned with
image x-position, so long lines can decode at FULL resolution: cut the
height-normalized line into overlapping fixed-width tiles (one static
shape -> one compiled kernel), keep a disjoint frame span per tile, and
collapse the stitched frame sequence as if it came from one wide encoder
pass.

This module holds the span geometry (:func:`long_line_spans` — a pure,
contract-tested function) and the engine-facing decode driver
(:class:`LongLineMixin`, mixed into
:class:`rcnn_ocr_tpu.inference.OCRInference`).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np

ImageLike = Union[np.ndarray, str, "Any"]


def long_line_spans(
    starts: Sequence[int],
    tile_w: int,
    frames_t: int,
    blank_scores: Optional[np.ndarray] = None,  # [n_tiles, frames_t]
) -> List[Tuple[int, int, int]]:
    """Per-tile kept frame ranges for long-line CTC stitching.

    ``starts`` are tile x-offsets in the height-normalized image (strictly
    increasing, consecutive tiles overlapping).  Each junction's overlap
    is split so every encoder frame of the full line is represented
    exactly once (up to frame-stride rounding): at the overlap MIDPOINT
    by default, or — when ``blank_scores`` (per-tile per-frame blank
    log-probs) is given — at the most blank-dominant shared frame, so the
    cut lands between characters instead of through one (a character
    straddling a midpoint cut loses frames on both sides and drops from
    the decode; measured on the synthetic long-line demo, PERF.md).
    Returns ``(tile_index, frame_from, frame_to)`` per tile — the
    contract `tests/test_long_lines.py` pins down.
    """
    stride = tile_w / frames_t
    cuts = []  # per junction: global CUT frame (left keeps < cut)
    for j in range(1, len(starts)):
        g_right = starts[j] / stride  # right tile's first global frame
        g_left_end = starts[j - 1] / stride + frames_t
        lo = int(np.ceil(g_right)) + 1  # keep >= 1 frame in the right tile
        hi = int(np.floor(g_left_end)) - 1  # and >= 1 in the left
        mid = int(round((g_right + g_left_end) / 2))
        cut = min(max(mid, lo), hi)
        if blank_scores is not None and hi > lo:
            g0 = int(round(starts[j - 1] / stride))
            g1 = int(round(g_right))
            best, best_score = cut, -np.inf
            for g in range(lo, hi + 1):
                fl, fr = g - g0, g - g1  # frame index in left/right tile
                score = 0.0
                if 0 <= fl < frames_t:
                    score += float(blank_scores[j - 1, fl])
                if 0 <= fr < frames_t:
                    score += float(blank_scores[j, fr])
                if score > best_score:
                    best, best_score = g, score
            cut = best
        if cuts:
            # monotone cuts: at overlaps > tile_w/2 consecutive snap
            # windows overlap and an earlier cut could land AFTER a later
            # one, decoding shared frames twice (fuzz-caught); the clamp
            # is a no-op at the default overlap <= tile_w/2
            cut = max(cut, cuts[-1])
        cuts.append(cut)

    spans = []
    for j, s in enumerate(starts):
        g0 = int(round(s / stride))
        f_from = 0 if j == 0 else min(max(cuts[j - 1] - g0, 0), frames_t - 1)
        f_to = frames_t if j + 1 == len(starts) else min(
            max(cuts[j] - g0, f_from + 1), frames_t
        )
        spans.append((j, f_from, f_to))
    return spans


def height_normalize(rgb: np.ndarray, img_h: int) -> np.ndarray:
    """Aspect-preserving resize to ``img_h`` rows (the cv2-exact policy
    every long-line path shares)."""
    import cv2

    from rcnn_ocr_tpu.data.loader import scaled_width

    h, w = rgb.shape[:2]
    new_w = scaled_width(h, w, img_h)
    shrinking = img_h < h or new_w < w
    return cv2.resize(
        rgb, (new_w, img_h),
        interpolation=cv2.INTER_AREA if shrinking else cv2.INTER_LINEAR,
    )


def plan_tiles(
    rgb_images: List[np.ndarray],
    img_h: int,
    tile_w: int,
    overlap: int,
    pad_one,
    keep_resized: bool = False,
):
    """Height-normalize and tile a list of decoded RGB images.

    Images whose scaled width fits one tile take the ordinary
    resize-and-pad path (``pad_one``), so short lines decode identically
    to the fixed-width engine.  Returns the flat tile list and, per image,
    ``(first_tile_index, tile_start_offsets)`` — plus, with
    ``keep_resized``, the height-normalized full images (the hybrid
    decode crops its segments from these).
    """
    from rcnn_ocr_tpu.data.loader import scaled_width

    tiles: List[np.ndarray] = []
    plans: List[Tuple[int, List[int]]] = []
    resized_images: List[np.ndarray] = []
    for rgb in rgb_images:
        h, w = rgb.shape[:2]
        new_w = scaled_width(h, w, img_h)
        if new_w <= tile_w:
            plans.append((len(tiles), [0]))
            if keep_resized:
                # build the tile FROM the kept resize instead of resizing
                # twice (pad_one repeats the same cv2.resize): identical
                # scaled-width rounding + interpolation policy and a
                # left/top-aligned paste make this byte-equal to
                # pad_one(rgb) — asserted in tests/test_long_lines.py
                resized = height_normalize(rgb, img_h)
                resized_images.append(resized)
                canvas = np.full(
                    (img_h, tile_w, 3), 255, dtype=resized.dtype
                )
                canvas[:, : resized.shape[1]] = resized
                tiles.append(canvas)
            else:
                tiles.append(pad_one(rgb))
            continue
        resized = height_normalize(rgb, img_h)
        if keep_resized:
            resized_images.append(resized)
        step = tile_w - overlap
        starts = list(range(0, new_w - tile_w, step))
        if starts[-1] != new_w - tile_w:
            starts.append(new_w - tile_w)  # right-aligned final tile
        plans.append((len(tiles), starts))
        tiles.extend(resized[:, s : s + tile_w] for s in starts)
    if keep_resized:
        return tiles, plans, resized_images
    return tiles, plans


def resolve_tiling(
    img_w: int,
    tile_w: Optional[int],
    overlap: Optional[int],
    require_frame_aligned: bool = False,
) -> Tuple[int, int]:
    """Default + validate the (tile_w, overlap) pair (shared by the live
    engine and the exported-artifact long driver).

    Most long paths derive the per-tile frame count from the kernel
    output and map px<->frames with a float stride, so ANY tile width
    works (the CTC stitcher, the hybrid segmenter, the text merge).  The
    aligned attention merge is the exception: it computes ``frames_t``
    statically as ``tile_w // TIME_DOWNSAMPLE``, which only equals the
    encoder's real frame count when the division is exact — those callers
    pass ``require_frame_aligned=True`` and a non-multiple width is
    refused loudly instead of silently misaligning every junction."""
    from rcnn_ocr_tpu.models.rcnn import TIME_DOWNSAMPLE

    tile_w = int(tile_w or img_w)
    if require_frame_aligned and tile_w % TIME_DOWNSAMPLE != 0:
        raise ValueError(
            f"the aligned attention merge needs tile_w to be a multiple of "
            f"{TIME_DOWNSAMPLE} (the model's time downsample), got {tile_w}; "
            f"use merge='text' or pick an aligned tile_w"
        )
    # default: 64 px of shared context per junction, clamped so tiny tile
    # widths (e.g. a 64 px canvas) still leave unique frames
    overlap = int(overlap) if overlap is not None else min(64, tile_w // 2)
    # upper bound: each tile must ADVANCE by at least one encoder frame
    # (TIME_DOWNSAMPLE px); with a near-total overlap the stitcher's
    # >=1-frame-per-tile clamp would decode shared frames more than once
    # (duplicated characters) — refuse loudly instead
    if not 0 < overlap <= tile_w - TIME_DOWNSAMPLE:
        raise ValueError(
            f"overlap must be in (0, {tile_w - TIME_DOWNSAMPLE}] "
            f"(tile_w - one {TIME_DOWNSAMPLE}-px encoder frame) so every "
            f"tile contributes unique frames, got {overlap}"
        )
    return tile_w, overlap


def extract_tile_frames(
    tiles: List[np.ndarray],
    batch_size: int,
    run,  # (tile_batch uint8 [B, H, W, 3]) -> (top-k vals, ids) device arrays
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the per-tile frame kernel over all tiles in static batches.

    Returns ``(vals [n_tiles, T, k], idx [n_tiles, T, k])`` host arrays.
    Shared by the live engine and the exported artifact so the batching /
    padding semantics cannot diverge.
    """
    from rcnn_ocr_tpu.postprocess import pad_rows

    all_vals: List[np.ndarray] = []
    all_idx: List[np.ndarray] = []
    for i in range(0, len(tiles), batch_size):
        chunk, n_real = pad_rows(tiles[i : i + batch_size], batch_size)
        vals, idx = run(np.stack(chunk))
        all_vals.append(np.asarray(vals)[:n_real])
        all_idx.append(np.asarray(idx)[:n_real])
    return np.concatenate(all_vals), np.concatenate(all_idx)


def extract_tile_ids(
    tiles: List[np.ndarray],
    batch_size: int,
    run,  # (tile_batch uint8 [B, H, W, 3]) -> per-frame argmax ids [B, T]
    with_maxp: bool = False,  # run also yields max-softmax [B, T] fp32
):
    """Argmax flavor of :func:`extract_tile_frames`: ``ids [n_tiles, T]``.

    The greedy/midpoint stitcher and the hybrid segmenter consume ONLY
    the per-frame argmax — fetching ids instead of the top-k pair cuts
    device->host traffic 32x at k=16 (measured: +36% end-to-end on
    ``predict_ctc_long``, PERF.md round 4).  ``with_maxp`` expects the
    kernel's confidence flavor and returns ``(ids, maxp)``.
    """
    from rcnn_ocr_tpu.postprocess import pad_rows

    out: List[np.ndarray] = []
    out_p: List[np.ndarray] = []
    for i in range(0, len(tiles), batch_size):
        chunk, n_real = pad_rows(tiles[i : i + batch_size], batch_size)
        got = run(np.stack(chunk))
        if with_maxp:
            ids, maxp = got
            out_p.append(np.asarray(maxp)[:n_real])
        else:
            ids = got
        out.append(np.asarray(ids)[:n_real])
    if with_maxp:
        return np.concatenate(out), np.concatenate(out_p)
    return np.concatenate(out)


def merge_tile_texts(
    texts: List[str], tile_w: int, starts: Sequence[int]
) -> str:
    """Overlap-aware merge of adjacent tiles' decoded texts.

    The attention head has no frame/position alignment to stitch, so the
    junction is resolved in TEXT space: both tiles decoded the shared
    ``overlap`` pixels, so the right tile's prefix repeats the left
    tile's suffix.  For each junction the candidate overlap length ``c``
    maximizing ``c - 2 * edit_distance(left[-c:], right[:c])`` wins (an
    exact repeat scores ``c``; a junction decoding nothing twice scores 0
    and concatenates plainly), bounded by the geometric estimate of how
    many characters the overlap pixels can hold (chars-per-pixel from the
    two tiles' own decode lengths) so repeated-pattern text cannot
    over-merge beyond the shared region.
    """
    from rcnn_ocr_tpu.training.metrics import levenshtein

    merged = texts[0]
    for i in range(1, len(texts)):
        # actual shared pixels at this junction (the right-aligned final
        # tile can overlap more than the nominal step)
        shared_px = starts[i - 1] + tile_w - starts[i]
        cpp = (len(texts[i - 1]) + len(texts[i])) / (2.0 * tile_w)
        max_c = int(np.ceil(shared_px * cpp * 1.5)) + 2
        right = texts[i]
        limit = min(max_c, len(merged), len(right))
        best_c, best_score = 0, 0.0
        for c in range(1, limit + 1):
            dist = levenshtein(merged[len(merged) - c :], right[:c])
            score = c - 2.0 * dist
            if score > best_score:
                best_score, best_c = score, c
        merged = merged + right[best_c:]
    return merged


def stitch_frames(
    vals: np.ndarray,  # [n_tiles, T, k] top-k frame log-probs
    idx: np.ndarray,  # [n_tiles, T, k] their class ids
    first: int,
    starts: Sequence[int],
    tile_w: int,
    frames_t: int,
    blank_lp: Optional[np.ndarray] = None,  # [n_tiles, T] blank log-probs
) -> Tuple[np.ndarray, np.ndarray]:
    """One image's tiles -> its full-line frame sequence.

    Applies the junction-cut spans (:func:`long_line_spans`) and
    concatenates each tile's kept frames — the shared front half of
    :func:`decode_stitched`, also consumed by the hybrid segmentation
    decode (which segments the stitched sequence instead of collapsing
    it)."""
    spans = [
        (first + j, a, b)
        for j, a, b in long_line_spans(
            starts, tile_w, frames_t,
            blank_scores=(
                blank_lp[first : first + len(starts)]
                if blank_lp is not None
                else None
            ),
        )
    ]
    v_cat = np.concatenate([vals[t, a:b] for t, a, b in spans])
    i_cat = np.concatenate([idx[t, a:b] for t, a, b in spans])
    return v_cat, i_cat


def stitch_frame_ids(
    ids: np.ndarray,  # [n_tiles, T] per-frame argmax class ids
    first: int,
    starts: Sequence[int],
    tile_w: int,
    frames_t: int,
) -> np.ndarray:
    """Ids-only :func:`stitch_frames`: one image's tiles -> its full-line
    argmax frame sequence ``[T_total]`` (midpoint junction cuts — the
    blank-snap policy needs per-frame blank scores and stays on the
    top-k path)."""
    spans = long_line_spans(starts, tile_w, frames_t)
    return np.concatenate([ids[first + j, a:b] for j, a, b in spans])


def _emitted_frame_confidence(
    i_cat: np.ndarray,  # [T_total] stitched argmax class ids
    maxp_cat: np.ndarray,  # [T_total] stitched max-softmax probabilities
    blank_id: int,
) -> float:
    """Mean max-softmax over the emitted (non-blank, non-repeat) frames —
    the stitched-line form of the greedy CTC confidence contract
    (`ops/ctc.py:ctc_greedy_decode_jnp`); all-blank lines fall back to the
    mean over every frame."""
    keep = (i_cat != blank_id)
    keep[1:] &= i_cat[1:] != i_cat[:-1]
    if not keep.any():
        return float(maxp_cat.mean()) if maxp_cat.size else 1.0
    return float(maxp_cat[keep].mean())


def decode_stitched_ids(
    ids: np.ndarray,  # [n_tiles, T] per-frame argmax class ids
    plans: List[Tuple[int, List[int]]],
    tile_w: int,
    *,
    blank_id: int,
    itos: List[str],
    skip_ids,
    maxp: Optional[np.ndarray] = None,  # [n_tiles, T] -> (text, conf) pairs
) -> List:
    """Greedy/midpoint fast path of :func:`decode_stitched` over argmax
    ids (the two produce IDENTICAL text — argmax == top-1 of top-k — at
    1/32nd the device->host bytes; equality-tested).  Shared by the live
    engine and exported ``ctc_long`` artifacts.  Passing ``maxp`` yields
    ``(text, confidence)`` pairs (emitted-frame mean max-softmax over the
    stitched sequence)."""
    from rcnn_ocr_tpu.ops.ctc import ctc_greedy_collapse_np, ids_to_text

    frames_t = ids.shape[1]
    results: List = []
    for first, starts in plans:
        i_cat = stitch_frame_ids(ids, first, starts, tile_w, frames_t)
        row = ctc_greedy_collapse_np(i_cat[None], blank_id)[0]
        text = ids_to_text([row], itos, skip_ids=skip_ids)[0]
        if maxp is not None:
            p_cat = stitch_frame_ids(maxp, first, starts, tile_w, frames_t)
            results.append(
                (text, _emitted_frame_confidence(i_cat, p_cat, blank_id))
            )
        else:
            results.append(text)
    return results


def segment_spans(
    frame_ids: np.ndarray,  # [T] per-frame argmax class ids
    blank_id: int,
    *,
    min_gap: int = 2,
    margin: int = 1,
    max_frames: Optional[int] = None,
) -> List[Tuple[int, int]]:
    """Character-group frame spans from a CTC frame sequence.

    Maximal non-blank runs, merged across blank gaps shorter than
    ``min_gap`` frames (single blanks separate repeated characters
    *inside* a word — they are not segment boundaries), padded by
    ``margin`` frames of context each side (margins may share blank gap
    frames with a neighbor but are clamped at the neighbor's character
    frames, so no character ever decodes twice), and — when
    ``max_frames`` is set — recursively split at the most central
    interior blank frame (midpoint when none) so every span fits a
    static decode width.  The cap is a hard guarantee INCLUDING margins:
    content at the cap sheds its margin instead of overflowing (an
    over-wide crop would be silently downscaled by the decode resize,
    losing the full-resolution read the hybrid path exists for).  Pure and contract-tested; the hybrid
    long-line decode maps these spans to pixel crops.
    """
    T = int(frame_ids.shape[0])
    nz = np.flatnonzero(np.asarray(frame_ids) != blank_id)
    if nz.size == 0:
        return []
    # maximal non-blank runs
    breaks = np.flatnonzero(np.diff(nz) > 1)
    runs = []
    start = 0
    for b in breaks:
        runs.append((int(nz[start]), int(nz[b]) + 1))
        start = b + 1
    runs.append((int(nz[start]), int(nz[-1]) + 1))
    # merge runs separated by < min_gap blank frames
    merged = [runs[0]]
    for s, e in runs[1:]:
        if s - merged[-1][1] < min_gap:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))

    def split(s: int, e: int) -> List[Tuple[int, int]]:
        if max_frames is None or e - s <= max_frames:
            return [(s, e)]
        # cut at the interior blank frame nearest the middle, else midpoint
        interior = np.flatnonzero(
            np.asarray(frame_ids[s + 1 : e - 1]) == blank_id
        )
        mid = (e - s) // 2
        cut = (
            s + 1 + int(interior[np.argmin(np.abs(interior - (mid - 1)))])
            if interior.size
            else s + mid
        )
        return split(s, cut) + split(cut, e)

    out: List[Tuple[int, int]] = []
    for s, e in merged:
        out.extend(split(s, e))
    # margin of context, clamped and kept disjoint; a span must NEVER
    # exceed max_frames even with its margins (the hybrid crop is
    # span_frames * stride px — wider than tile_w it gets silently
    # DOWNSCALED by the resize-and-pad, defeating the full-resolution
    # read), so when content sits at the cap the margin gives way
    padded: List[Tuple[int, int]] = []
    for i, (s, e) in enumerate(out):
        lo = max(0, s - margin, out[i - 1][1] if i else 0)
        hi = min(T, e + margin, out[i + 1][0] if i + 1 < len(out) else T)
        if max_frames is not None and hi - lo > max_frames:
            # trim margin frames only — the content run fits after split
            excess = (hi - lo) - max_frames
            cut_hi = min(hi - e, (excess + 1) // 2)
            cut_lo = min(s - lo, excess - cut_hi)
            cut_hi = min(hi - e, excess - cut_lo)  # rebalance short sides
            lo += cut_lo
            hi -= cut_hi
        padded.append((lo, hi))
    return padded


def hybrid_decode_driver(
    rgb_images: List[np.ndarray],
    img_h: int,
    tile_w: int,
    overlap: int,
    pad_one,
    batch_size: int,
    tile_fn,  # uint8 [B,H,tile_w,3] -> per-frame argmax ids [B, T]
    decode_fn,  # uint8 [B,H,tile_w,3] -> (pred, aux) attention decode
    decode_row,  # (token row, aux row|None) -> text | (text, confidence)
    blank_id: int,
    min_gap: int,
    margin: int,
    return_confidence: bool = False,
):
    """The segment-then-read host driver shared by the live engine
    (`predict_hybrid_long`) and the exported artifact
    (`ServingArtifact._predict_hybrid`) — ONE implementation so the
    deployment unit cannot drift from the engine it was exported from.

    1) CTC frames per tile -> stitched full-line frame sequence
    2) :func:`segment_spans` locates character groups; each is cropped
       from the height-normalized image at full resolution
    3) every crop decodes through ``decode_fn`` like a short line

    With ``return_confidence`` every element is ``(text, confidence)``:
    the char-count-weighted mean of the per-segment confidences
    ``decode_row`` returns — each segment follows the framework's one
    attention-confidence contract (mean max-softmax / beam geometric
    mean), so a single-segment line reports exactly what ``predict``
    would; a line with no segments reports 0.0.
    """
    from rcnn_ocr_tpu.postprocess import pad_rows

    tiles, plans, resized = plan_tiles(
        rgb_images, img_h, tile_w, overlap, pad_one, keep_resized=True,
    )
    ids = extract_tile_ids(tiles, batch_size, tile_fn)
    frames_t = ids.shape[1]
    stride = tile_w / frames_t  # px per frame (the model's time downsample)

    crops: List[np.ndarray] = []
    crop_of_image: List[int] = []
    for img_i, (first, starts) in enumerate(plans):
        i_cat = stitch_frame_ids(ids, first, starts, tile_w, frames_t)
        full_w = resized[img_i].shape[1]
        for s, e in segment_spans(
            i_cat, blank_id,
            min_gap=min_gap, margin=margin, max_frames=frames_t,
        ):
            px_lo = max(0, int(s * stride))
            # clamp to tile_w: floor(lo) + round(hi) can otherwise reach
            # tile_w + 1 px at a non-frame-aligned tile_w (fractional
            # stride), and a crop wider than the canvas would be silently
            # DOWNSCALED by pad_one — the exact failure segment_spans'
            # max_frames cap exists to prevent
            px_hi = min(full_w, int(round(e * stride)), px_lo + tile_w)
            if px_hi <= px_lo:
                continue
            crops.append(resized[img_i][:, px_lo:px_hi])
            crop_of_image.append(img_i)

    n = len(rgb_images)
    texts = [""] * n
    conf_num = [0.0] * n
    conf_den = [0] * n
    padded = [pad_one(c) for c in crops]
    for i in range(0, len(padded), batch_size):
        chunk, n_real = pad_rows(padded[i : i + batch_size], batch_size)
        pred, aux = decode_fn(np.stack(chunk))
        pred = np.asarray(pred)[:n_real]
        aux = np.asarray(aux)[:n_real] if return_confidence else None
        for j in range(n_real):
            img_i = crop_of_image[i + j]
            out = decode_row(pred[j], aux[j] if aux is not None else None)
            if return_confidence:
                text, conf = out
                if text:
                    conf_num[img_i] += conf * len(text)
                    conf_den[img_i] += len(text)
            else:
                text = out
            texts[img_i] += text
    if return_confidence:
        return [
            (t, conf_num[i] / conf_den[i] if conf_den[i] else 0.0)
            for i, t in enumerate(texts)
        ]
    return texts


def stitch_aligned_rows(
    tokens: np.ndarray,  # [n_tiles, steps] decoded token ids
    aligns: np.ndarray,  # [n_tiles, steps] attention frame argmax per step
    starts: Sequence[int],
    tile_w: int,
    frames_t: int,
    *,
    eos_id: int,
    skip_ids,
    itos: Sequence[str],
) -> str:
    """Frame-aligned junction merge for the attention head.

    The text-space merge (:func:`merge_tile_texts`) has to *guess* where
    adjacent tiles' decodes overlap; the decoder itself knows — its
    attention argmax says which encoder frame each character was read
    from.  Cutting each junction at the overlap midpoint in FRAME space
    (the same :func:`long_line_spans` policy the CTC stitcher uses) and
    keeping only the characters whose alignment falls inside the tile's
    span de-duplicates the overlap exactly: a character is emitted by the
    tile that owns its x-position, once.  Measured on the PERF.md
    long-line demo (`tools/long_line_demo.py`).
    """
    spans = long_line_spans(starts, tile_w, frames_t)
    chars: List[str] = []
    for j, f_from, f_to in spans:
        for tok, al in zip(tokens[j], aligns[j]):
            tok = int(tok)
            if tok == eos_id:
                break
            if tok in skip_ids or tok >= len(itos):
                continue
            if f_from <= int(al) < f_to:
                chars.append(itos[tok])
    return "".join(chars)


def decode_stitched(
    vals: np.ndarray,  # [n_tiles, T, k] top-k frame log-probs
    idx: np.ndarray,  # [n_tiles, T, k] their class ids
    plans: List[Tuple[int, List[int]]],  # per image: (first tile, starts)
    tile_w: int,
    *,
    blank_id: int,
    num_classes: int,
    itos: List[str],
    skip_ids,
    method: str = "greedy",
    beam_width: int = 16,
    snap: str = "midpoint",  # junction cuts: "midpoint" | "blank" (snap)
    return_confidence: bool = False,
) -> List:
    """Stitch per-tile frames into one sequence per image and collapse it.

    The ONE stitched-decode implementation shared by
    ``OCRInference.predict_ctc_long`` and the exported
    ``ServingArtifact`` — junction cuts land at the overlap midpoint
    (default) or, with ``snap="blank"``, at the most blank-dominant
    shared frame (:func:`long_line_spans`); then the concatenated frame
    sequence collapses greedily or through the host prefix beam.
    Measured twice (round 3 toy model; round 4 character-dense model,
    `tools/long_line_demo.py`, PERF.md): the two policies differ within
    noise (CER 0.2643 vs 0.2635), so the simpler midpoint is the
    default and blank-snap is the opt-in.
    """
    from rcnn_ocr_tpu.ops.ctc import (
        ctc_beam_search,
        ctc_greedy_collapse_np,
        ids_to_text,
    )

    if snap not in ("blank", "midpoint"):
        raise ValueError(f"snap must be 'blank' or 'midpoint', got {snap!r}")
    frames_t = vals.shape[1]
    # per-tile per-frame blank log-prob (-inf when blank left the top-k):
    # junction cuts snap to the most blank-dominant frame
    blank_lp = (
        np.where(idx == blank_id, vals, -np.inf).max(-1)
        if snap == "blank"
        else None
    )

    results: List = []
    for first, starts in plans:
        v_cat, i_cat = stitch_frames(
            vals, idx, first, starts, tile_w, frames_t,
            blank_lp=blank_lp,
        )
        conf = None
        if method == "greedy":
            row = ctc_greedy_collapse_np(i_cat[None, :, 0], blank_id)[0]
            if return_confidence:
                # slot 0 is the argmax: exp(top-1 log-prob) == max-softmax
                conf = _emitted_frame_confidence(
                    i_cat[:, 0], np.exp(v_cat[:, 0]), blank_id
                )
        else:
            dense = np.full(
                (1, v_cat.shape[0], num_classes), -1e30, np.float32
            )
            np.put_along_axis(dense, i_cat[None], v_cat[None], -1)
            got = ctc_beam_search(
                dense, blank_id=blank_id, beam_width=beam_width,
                already_log_probs=True, return_totals=return_confidence,
            )
            if return_confidence:
                rows, lps, totals = got
                conf = float(np.exp(lps[0] - totals[0]))
            else:
                rows, _ = got
            row = rows[0]
        text = ids_to_text([row], itos, skip_ids=skip_ids)[0]
        results.append((text, conf) if return_confidence else text)
    return results


class LongLineMixin:
    """`predict_ctc_long` for :class:`~rcnn_ocr_tpu.inference.OCRInference`."""

    def predict_ctc_long(
        self,
        images: Union[ImageLike, List[ImageLike]],
        tile_w: Optional[int] = None,
        overlap: Optional[int] = None,
        batch_size: int = 32,
        method: str = "greedy",
        beam_width: int = 16,
        prune_k: int = 16,
        snap: str = "midpoint",  # junction cuts: "midpoint" | "blank" (snap)
        return_confidence: bool = False,
    ):
        """Unbounded-width decode: tile, trim, and concatenate CTC frames.

        Height-normalize preserving aspect, cut ``tile_w``-wide tiles
        overlapping by ``overlap`` px, run the encoder per tile (tiles
        batch together — one static shape, one compile), drop half of each
        junction's overlap frames per side (:func:`long_line_spans`),
        concatenate the frame sequence, and collapse (``greedy``) or
        prefix-beam (``beam``) the stitched whole on the host.  Images
        that fit one tile take the ordinary resize-pad path, so short
        lines decode identically to ``predict_ctc``.

        The attention head has no frame/position alignment to stitch —
        see ``predict_long`` for its segmentation-based counterpart.

        ``return_confidence`` yields ``(text, confidence)`` pairs: greedy
        — mean max-softmax over the stitched line's emitted frames (the
        ``predict_ctc`` contract applied to the concatenated sequence; the
        fast path fetches one extra [B, T] fp32 row); beam — the winner's
        normalized posterior among the final beams of the stitched search.
        """
        if not self.model.with_ctc_head:
            raise ValueError("this checkpoint has no CTC head")
        if method not in ("greedy", "beam"):
            raise ValueError(f"Unsupported decode method: {method}")
        from rcnn_ocr_tpu.data.transforms import ResizeAndPad
        from rcnn_ocr_tpu.postprocess import ctc_skip_ids

        is_single = not isinstance(images, list)
        images_list: List[ImageLike] = [images] if is_single else list(images)
        if not images_list:
            return []
        tile_w, overlap = resolve_tiling(self.img_w, tile_w, overlap)
        batch_size = self._round_batch(batch_size)
        pad_one = ResizeAndPad(img_h=self.img_h, img_w=tile_w)

        # --- plan: height-normalized tiles + per-image start offsets ---
        tiles, plans = plan_tiles(
            [self._to_rgb(img) for img in images_list],
            self.img_h, tile_w, overlap, pad_one,
        )

        skip = ctc_skip_ids(
            self.charset.pad_id, self.charset.sos_id, self.charset.eos_id,
            self.charset.ctc_blank_id,
        )
        if method == "greedy" and snap == "midpoint":
            # fast path: only the per-frame argmax crosses the link
            # (identical text to the top-k path; equality-tested);
            # confidence adds one [B, T] fp32 max-softmax row
            ids_kernel = self._ctc_frame_ids_fn(with_maxp=return_confidence)
            got = extract_tile_ids(
                tiles, batch_size,
                lambda b: ids_kernel(self.variables, self._device_batch(b)),
                with_maxp=return_confidence,
            )
            ids, maxp = got if return_confidence else (got, None)
            results = decode_stitched_ids(
                ids, plans, tile_w,
                blank_id=self.charset.ctc_blank_id,
                itos=self._itos, skip_ids=skip,
                maxp=maxp,
            )
            return results[0] if is_single else results

        # --- batched frame extraction (pruned top-k; slot 0 == argmax) ---
        k = max(1, min(prune_k, self.charset.num_classes))
        kernel = self._ctc_fn(False, k)
        vals, idx = extract_tile_frames(
            tiles, batch_size,
            lambda batch: kernel(self.variables, self._device_batch(batch)),
        )

        # --- stitch + decode per image (shared with ServingArtifact) ---
        results = decode_stitched(
            vals, idx, plans, tile_w,
            blank_id=self.charset.ctc_blank_id,
            num_classes=self.charset.num_classes,
            itos=self._itos,
            skip_ids=skip,
            method=method,
            beam_width=beam_width,
            snap=snap,
            return_confidence=return_confidence,
        )
        return results[0] if is_single else results

    def predict_hybrid_long(
        self,
        images: Union[ImageLike, List[ImageLike]],
        tile_w: Optional[int] = None,
        overlap: Optional[int] = None,
        batch_size: int = 32,
        max_length: int = 25,
        beam: bool = False,
        beam_width: int = 16,
        length_penalty: float = 0.0,
        lm_weight: float = 0.0,
        prune_k: int = 16,
        min_gap: int = 3,
        margin: int = 1,
        return_confidence: bool = False,
    ):
        """Hybrid unbounded-width decode: CTC segments, attention reads.

        The tiled attention decode's measured failure mode (PERF.md round
        4) is edge-truncated characters derailing the autoregressive LSTM
        state — a per-tile problem no junction policy can repair.  This
        path removes the truncation instead: the CTC head's stitched
        frame sequence (cheap, per-frame, truncation-immune) locates
        character groups (:func:`segment_spans` — non-blank runs cut at
        blank gaps of ``min_gap``+ frames), and each segment is cropped
        from the height-normalized image at FULL resolution — complete
        characters, blank margins — and decoded by the attention head
        exactly like a short line.  The seq2seq head (the reference's
        primary decoder, `/root/reference/model/model.py:91-112`) then
        reads every segment inside its training distribution.

        Measured (PERF.md round 4, `tools/long_line_demo.py`): the best
        ATTENTION-read long-line path (CER 0.44 vs 0.56 per-tile), though
        the frame-stitched CTC decode (0.26) stays ahead where the CTC
        head is well trained — this path is for checkpoints whose seq2seq
        head is the stronger reader.  Defaults (`min_gap=3, margin=1`)
        are the sweep optimum from the same measurement.

        Requires both heads.  Segments wider than one tile are split at
        interior blank frames so every crop fits the static decode width.
        ``beam=True`` decodes segments with the device beam (+ optional
        LM fusion / length penalty, like ``predict``).  ``prune_k`` is
        accepted for signature stability but unused: the segmenter reads
        per-frame argmax ids (1/32nd the fetch of the former top-k).
        ``return_confidence`` yields ``(text, confidence)`` pairs — the
        char-count-weighted mean of per-segment confidences under the
        framework's one attention-confidence contract (``predict``
        parity on single-segment lines); the fixed-width CTC paths stay
        confidence-free by design, but this path READS with the
        attention head, so the contract applies.
        """
        if not (self.model.with_ctc_head and self.model.with_attention_head):
            raise ValueError("hybrid long-line decode needs BOTH heads")
        from rcnn_ocr_tpu.data.transforms import ResizeAndPad
        from rcnn_ocr_tpu.postprocess import (
            decode_attention_row,
            decode_beam_row,
        )

        is_single = not isinstance(images, list)
        images_list: List[ImageLike] = [images] if is_single else list(images)
        if not images_list:
            return []
        tile_w, overlap = resolve_tiling(self.img_w, tile_w, overlap)
        batch_size = self._round_batch(batch_size)
        pad_one = ResizeAndPad(img_h=self.img_h, img_w=tile_w)
        # px<->frame mapping: hybrid_decode_driver derives frames_t from
        # the kernel output and uses a float stride, so any tile_w works

        kernel = self._ctc_frame_ids_fn()  # argmax ids only (32x less fetch)
        steps = max_length + 1
        run = (
            self._attn_beam_fn(steps, int(beam_width), length_penalty, lm_weight)
            if beam
            else self._greedy_fn(steps)
        )
        row_fn = decode_beam_row if beam else decode_attention_row

        def decode_row(pred_row, aux_row):
            return row_fn(
                pred_row, aux_row, self._itos,
                pad_id=self.charset.pad_id, eos_id=self.charset.eos_id,
                blank_id=self.charset.blank_id,
                return_confidence=return_confidence,
            )

        texts = hybrid_decode_driver(
            [self._to_rgb(img) for img in images_list],
            self.img_h, tile_w, overlap, pad_one, batch_size,
            tile_fn=lambda b: kernel(self.variables, self._device_batch(b)),
            decode_fn=lambda b: run(self.variables, self._device_batch(b)),
            decode_row=decode_row,
            blank_id=self.charset.ctc_blank_id,
            min_gap=min_gap, margin=margin,
            return_confidence=return_confidence,
        )
        return texts[0] if is_single else texts

    def predict_long(
        self,
        images: Union[ImageLike, List[ImageLike]],
        method: str = "attention",
        tile_w: Optional[int] = None,
        overlap: Optional[int] = None,
        batch_size: int = 32,
        max_length: int = 25,
        beam_width: int = 16,
        length_penalty: float = 0.0,
        lm_weight: float = 0.0,
        prune_k: int = 16,
        snap: str = "midpoint",
        merge: str = "align",
        return_confidence: bool = False,
    ):
        """Unbounded-width decode for EVERY head (one entry point).

        ``method="ctc_greedy"`` / ``"ctc_beam"`` route to the frame-level
        stitcher (:meth:`predict_ctc_long`).  ``method="hybrid"`` /
        ``"hybrid_beam"`` (both heads required) segment by CTC blanks and
        read each segment with the attention head at full resolution
        (:meth:`predict_hybrid_long` — the measured-best ATTENTION-read
        long-line path, PERF.md round 4; the CTC stitcher stays ahead
        where the CTC head is the stronger reader).
        ``method="attention"`` / ``"attention_beam"``
        give the reference's primary (and sometimes only) decode head
        (`/root/reference/model/model.py:91-112`) a long-line story of
        its own: the same overlapping tiles, each decoded by the seq2seq
        head (short lines therefore decode IDENTICALLY to ``predict``),
        then de-duplicated at the junctions.

        ``merge`` picks the junction policy:

        * ``"align"`` (default) — frame-aligned: the decoder's attention
          argmax gives each character an x-position, and each junction
          cuts at the overlap midpoint in frame space exactly like the
          CTC stitcher (:func:`stitch_aligned_rows`).  Measured (PERF.md
          round 4): equal to the text merge at small overlaps and FLAT
          as overlap grows (0.56 CER at 24-48 px), where the text merge
          degrades to worse-than-squash (0.56 -> 1.09) because wider
          junctions make the suffix/prefix guess ambiguous.
        * ``"text"`` — position-free fallback: the overlap pixels decode
          in both tiles, so the best suffix/prefix edit alignment locates
          the repeat (:func:`merge_tile_texts`).  Only safe at small
          overlaps.

        ``max_length`` bounds the PER-TILE decode (a tile holds at most
        ~tile_w/char_w characters, so the default is usually ample).

        ``return_confidence`` is supported by the hybrid methods (they
        READ with the attention head, whose contract applies per segment)
        and the CTC stitcher (emitted-frame mean max-softmax / stitched
        beam posterior, :meth:`predict_ctc_long`); the tiled ATTENTION
        paths raise — a junction-merged tile decode has no step-aligned
        confidence to report.
        """
        if return_confidence and method in ("attention", "attention_beam"):
            raise ValueError(
                "return_confidence is not supported by the tiled attention "
                "merge (junction-merged decodes have no step-aligned "
                "confidence) — use the hybrid or ctc methods"
            )
        if method in ("ctc_greedy", "ctc_beam", "greedy", "beam"):
            return self.predict_ctc_long(
                images, tile_w=tile_w, overlap=overlap,
                batch_size=batch_size,
                method="beam" if method.endswith("beam") else "greedy",
                beam_width=beam_width, prune_k=prune_k, snap=snap,
                return_confidence=return_confidence,
            )
        if method in ("hybrid", "hybrid_beam"):
            return self.predict_hybrid_long(
                images, tile_w=tile_w, overlap=overlap,
                batch_size=batch_size, max_length=max_length,
                beam=method.endswith("beam"), beam_width=beam_width,
                length_penalty=length_penalty, lm_weight=lm_weight,
                prune_k=prune_k, return_confidence=return_confidence,
            )
        if method not in ("attention", "attention_beam"):
            raise ValueError(f"Unsupported decode method: {method}")
        if merge not in ("align", "text"):
            raise ValueError(f"merge must be 'align' or 'text', got {merge!r}")
        if not self.model.with_attention_head:
            raise ValueError("this checkpoint has no attention head")
        from rcnn_ocr_tpu.data.transforms import ResizeAndPad
        from rcnn_ocr_tpu.models.rcnn import TIME_DOWNSAMPLE

        is_single = not isinstance(images, list)
        images_list: List[ImageLike] = [images] if is_single else list(images)
        if not images_list:
            return []
        tile_w, overlap = resolve_tiling(
            self.img_w, tile_w, overlap,
            require_frame_aligned=(merge == "align"),
        )
        batch_size = self._round_batch(batch_size)
        pad_one = ResizeAndPad(img_h=self.img_h, img_w=tile_w)
        tiles, plans = plan_tiles(
            [self._to_rgb(img) for img in images_list],
            self.img_h, tile_w, overlap, pad_one,
        )

        # decode every tile through the attention kernels (one static
        # shape -> one compile); the alignment flavor also ships each
        # step's attention argmax for the frame-aligned merge
        steps = max_length + 1
        beam = method == "attention_beam"
        # the text merge never reads the alignment — use the plain kernels
        # (shared with predict/predict_hybrid_long, so usually already
        # compiled; the beam also skips the [B,K,steps] alignment carry)
        need_align = merge == "align"
        if beam:
            run = (
                self._attn_beam_align_fn if need_align else self._attn_beam_fn
            )(steps, int(beam_width), length_penalty, lm_weight)
        else:
            run = (
                self._greedy_align_fn if need_align else self._greedy_fn
            )(steps)
        from rcnn_ocr_tpu.postprocess import pad_rows

        tok_rows: List[np.ndarray] = []
        align_rows: List[np.ndarray] = []
        for i in range(0, len(tiles), batch_size):
            chunk, n_real = pad_rows(tiles[i : i + batch_size], batch_size)
            out = run(self.variables, self._device_batch(np.stack(chunk)))
            pred = out[0]
            tok_rows.extend(np.asarray(pred)[:n_real])
            if need_align:
                align = out[2] if beam else out[1]
                align_rows.extend(np.asarray(align)[:n_real])

        def tile_text(row: np.ndarray) -> str:
            from rcnn_ocr_tpu.vocab.charset import decode_tokens

            return decode_tokens(
                row, self._itos,
                pad_id=self.charset.pad_id, eos_id=self.charset.eos_id,
                blank_id=self.charset.blank_id,
            )

        skip_ids = {
            v for v in (self.charset.pad_id, self.charset.blank_id)
            if v is not None
        }
        results: List[str] = []
        for first, starts in plans:
            if len(starts) == 1:
                results.append(tile_text(tok_rows[first]))
            elif merge == "align":
                results.append(stitch_aligned_rows(
                    np.stack(tok_rows[first : first + len(starts)]),
                    np.stack(align_rows[first : first + len(starts)]),
                    starts, tile_w, tile_w // TIME_DOWNSAMPLE,
                    eos_id=self.charset.eos_id,
                    skip_ids=skip_ids,
                    itos=self._itos,
                ))
            else:
                texts = [
                    tile_text(tok_rows[first + j]) for j in range(len(starts))
                ]
                results.append(merge_tile_texts(texts, tile_w, starts))
        return results[0] if is_single else results
