"""ctypes bindings for the first-party C++ helpers in ``native/``.

Provides unicode-aware Levenshtein distance and CTC prefix beam search.
The shared library is built lazily with ``make`` on first use and cached;
every entry point degrades gracefully (returns a sentinel / ``None``) when
the toolchain or library is unavailable, and pure-Python fallbacks live at
the call sites (:mod:`rcnn_ocr_tpu.training.metrics`,
:mod:`rcnn_ocr_tpu.ops.ctc`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librcnn_ocr_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _stale() -> bool:
    """True when the .so is missing or any C++ source/Makefile is newer."""
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    try:
        names = os.listdir(_NATIVE_DIR)
    except OSError:
        return False
    for name in names:
        if name.endswith(".cpp") or name == "Makefile":
            if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > so_mtime:
                return True
    return False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.path.isdir(_NATIVE_DIR) and _stale():
            # only shell out to make when the .so is missing or older than a
            # source file — keeps cold starts subprocess-free and narrows
            # the concurrent-rebuild window to actual dev-time rebuilds
            _build()
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        lib.rcnn_levenshtein_u32.restype = ctypes.c_int64
        lib.rcnn_levenshtein_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
        ]
        try:
            lib.rcnn_levenshtein_batch_u32.restype = None
            lib.rcnn_levenshtein_batch_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
        except AttributeError:
            pass  # stale library; callers fall back to per-pair calls
        lib.rcnn_ctc_beam_search_batch.restype = ctypes.c_int64
        lib.rcnn_ctc_beam_search_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        try:
            lib.rcnn_ctc_beam_search_batch_mt.restype = ctypes.c_int64
            lib.rcnn_ctc_beam_search_batch_mt.argtypes = (
                lib.rcnn_ctc_beam_search_batch.argtypes + [ctypes.c_int64]
            )
        except AttributeError:
            # stale library predating the pooled beam; serial path used
            pass
        try:
            # v2: + final-beam logsumexp output (beam confidence)
            v2_args = lib.rcnn_ctc_beam_search_batch.argtypes + [
                ctypes.POINTER(ctypes.c_float)
            ]
            lib.rcnn_ctc_beam_search_batch_v2.restype = ctypes.c_int64
            lib.rcnn_ctc_beam_search_batch_v2.argtypes = v2_args
            lib.rcnn_ctc_beam_search_batch_mt_v2.restype = ctypes.c_int64
            lib.rcnn_ctc_beam_search_batch_mt_v2.argtypes = v2_args + [
                ctypes.c_int64
            ]
        except AttributeError:
            pass  # stale library; totals requests fall back to Python
        try:
            lib.rcnn_letterbox_u8.restype = ctypes.c_int64
            lib.rcnn_letterbox_u8.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
            ]
        except AttributeError:
            # stale library predating letterbox; callers fall back to numpy
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u32(seq) -> np.ndarray:
    if isinstance(seq, str):
        return np.frombuffer(seq.encode("utf-32-le"), dtype=np.uint32).copy()
    return np.asarray(seq, dtype=np.uint32)


def _lev_u32(aa: np.ndarray, bb: np.ndarray) -> int:
    """One FFI body for both public entry points (strings / id lists)."""
    lib = _load()
    if lib is None:
        return -1
    return int(
        lib.rcnn_levenshtein_u32(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(aa),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(bb),
        )
    )


def levenshtein(a: str, b: str) -> int:
    """Edit distance between two strings; -1 when the library is missing."""
    return _lev_u32(_as_u32(a), _as_u32(b))


def levenshtein_ids(a: Sequence[int], b: Sequence[int]) -> int:
    """Edit distance between two id sequences; -1 when unavailable."""
    return _lev_u32(_as_u32(a), _as_u32(b))


def levenshtein_batch(refs: Sequence, hyps: Sequence) -> Optional[np.ndarray]:
    """Edit distances for N (ref, hyp) pairs in ONE FFI call.

    Accepts strings or id sequences per row; returns ``int64 [N]`` or
    ``None`` when the library (or the batch entry) is unavailable — the
    caller falls back to per-pair calls.  One call per dataset instead of
    one per pair is what the eval CLI's CER/WER loop wants.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "rcnn_levenshtein_batch_u32"):
        return None
    if len(refs) != len(hyps):
        raise ValueError("refs and hyps must have equal length")
    n = len(refs)
    out = np.zeros((n,), np.int64)
    if n == 0:
        return out
    ref_rows = [_as_u32(r) for r in refs]
    hyp_rows = [_as_u32(h) for h in hyps]
    ref_lens = np.asarray([len(r) for r in ref_rows], np.int64)
    hyp_lens = np.asarray([len(h) for h in hyp_rows], np.int64)
    ref_cat = (
        np.concatenate(ref_rows) if ref_lens.sum() else np.zeros(1, np.uint32)
    )
    hyp_cat = (
        np.concatenate(hyp_rows) if hyp_lens.sum() else np.zeros(1, np.uint32)
    )
    lib.rcnn_levenshtein_batch_u32(
        ref_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ref_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hyp_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        hyp_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def letterbox_u8(
    images: Sequence[np.ndarray],
    canvas_h: int,
    canvas_w: int,
    threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Thread-pooled batch letterbox: paste HWC uint8 images into a fixed
    uint8 canvas batch (larger images crop).  Returns ``(canvas [N, H, W, 3],
    sizes [N, 2])`` or ``None`` when the native library is unavailable or an
    input is not contiguous HWC uint8 (caller falls back to numpy)."""
    lib = _load()
    if lib is None or not hasattr(lib, "rcnn_letterbox_u8"):
        return None
    n = len(images)
    out = np.empty((n, canvas_h, canvas_w, 3), dtype=np.uint8)
    sizes = np.zeros((n, 2), dtype=np.int32)
    if n == 0:
        return out, sizes
    for img in images:
        if not (
            isinstance(img, np.ndarray)
            and img.dtype == np.uint8
            and img.ndim == 3
            and img.shape[2] == 3
            and img.flags["C_CONTIGUOUS"]
        ):
            return None
    ptrs = (ctypes.c_void_p * n)(*[img.ctypes.data for img in images])
    hs = np.array([img.shape[0] for img in images], dtype=np.int64)
    ws = np.array([img.shape[1] for img in images], dtype=np.int64)
    res = lib.rcnn_letterbox_u8(
        ptrs,
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(canvas_h),
        int(canvas_w),
        int(threads),
    )
    if res < 0:
        return None
    sizes[:, 0] = np.minimum(hs, canvas_h)
    sizes[:, 1] = np.minimum(ws, canvas_w)
    return out, sizes


def ctc_beam_search_batch(
    log_probs: np.ndarray,
    blank: int,
    beam_width: int,
    lengths: Optional[np.ndarray] = None,
    max_out: Optional[int] = None,
    threads: int = 0,
    want_totals: bool = False,
):
    """Beam-search decode a batch of CTC log-prob frames.

    ``log_probs``: float32 [B, T, V]. Returns ``(label_lists, log_probs)``
    or ``None`` when the native library is unavailable.  Rows run on a
    thread pool when the library ships the pooled entry point
    (``threads=0`` uses the hardware concurrency; 1 forces serial).
    ``want_totals`` appends the per-row final-beam logsumexp (confidence
    numerator); requires the v2 symbols — returns ``None`` on a stale
    library so callers fall back to the Python search.
    """
    lib = _load()
    if lib is None:
        return None
    have_v2 = hasattr(lib, "rcnn_ctc_beam_search_batch_v2")
    if want_totals and not have_v2:
        return None
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    batch, t_steps, vocab = lp.shape
    cap = int(max_out if max_out is not None else t_steps)
    out_labels = np.zeros((batch, max(cap, 1)), dtype=np.int32)
    out_lens = np.zeros((batch,), dtype=np.int64)
    out_lp = np.zeros((batch,), dtype=np.float32)
    out_totals = np.zeros((batch,), dtype=np.float32)
    lens_arr = None
    lens_ptr = None
    if lengths is not None:
        lens_arr = np.ascontiguousarray(lengths, dtype=np.int64)
        lens_ptr = lens_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    args = (
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        batch,
        t_steps,
        vocab,
        lens_ptr,
        int(blank),
        int(beam_width),
        out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_labels.shape[1],
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if want_totals:
        totals_ptr = out_totals.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if hasattr(lib, "rcnn_ctc_beam_search_batch_mt_v2") and threads != 1:
            res = lib.rcnn_ctc_beam_search_batch_mt_v2(
                *args, totals_ptr, int(threads)
            )
        else:
            res = lib.rcnn_ctc_beam_search_batch_v2(*args, totals_ptr)
    elif hasattr(lib, "rcnn_ctc_beam_search_batch_mt") and threads != 1:
        res = lib.rcnn_ctc_beam_search_batch_mt(*args, int(threads))
    else:
        res = lib.rcnn_ctc_beam_search_batch(*args)
    if res < 0:
        return None
    labels = [out_labels[i, : out_lens[i]].tolist() for i in range(batch)]
    if want_totals:
        return labels, out_lp, out_totals
    return labels, out_lp
