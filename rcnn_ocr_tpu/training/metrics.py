"""OCR quality metrics: CER, WER, exact-match accuracy.

Semantics follow `/root/reference/training/metrics.py`:

* ``character_error_rate`` = char-level Levenshtein distance / len(reference);
  empty reference -> ``inf`` when the hypothesis is non-empty, else ``0.0``.
* ``word_error_rate`` = word-level Levenshtein distance / #reference-words,
  with words split on whitespace (the reference used `jiwer.wer`, whose
  default pipeline reduces both strings to whitespace-separated word lists).
  Divergence note: `jiwer` *raises* on an empty reference; we return the
  CER-style ``inf``/``0.0`` instead so the metric is total.  The evaluation
  CLI clamps non-finite WERs to 1.0, matching the reference CLI's
  catch-all (`/root/reference/evaluate_dataset.py:108-115`).
* ``compute_accuracy`` = exact-match rate.

The edit-distance core prefers the native C++ extension
(:mod:`rcnn_ocr_tpu.native`), then the `Levenshtein` C library, then a pure
NumPy fallback — all three agree exactly.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

try:  # optional C library present in most environments
    import Levenshtein as _lev
except ImportError:  # pragma: no cover
    _lev = None

from rcnn_ocr_tpu import native as _native


def _levenshtein_py(a: Sequence, b: Sequence) -> int:
    """Two-row dynamic-programming edit distance over arbitrary sequences."""
    if len(a) < len(b):
        a, b = b, a
    if len(b) == 0:
        return len(a)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ca in enumerate(a, start=1):
        cur[0] = i
        b_arr = np.asarray([1 if ca != cb else 0 for cb in b], dtype=np.int64)
        # vectorized inner loop is tricky due to the running minimum; keep the
        # scalar loop — strings here are <= max_len (~40 chars)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + b_arr[j - 1])
        prev, cur = cur, prev
    return int(prev[len(b)])


def levenshtein(a: str, b: str) -> int:
    """Character-level edit distance (native C++ > Levenshtein lib > Python)."""
    d = _native.levenshtein(a, b)
    if d >= 0:
        return d
    if _lev is not None:
        return _lev.distance(a, b)
    return _levenshtein_py(a, b)


def character_error_rate(reference: str, hypothesis: str) -> float:
    if len(reference) == 0:
        return float("inf") if len(hypothesis) > 0 else 0.0
    return levenshtein(reference, hypothesis) / len(reference)


def word_error_rate(reference: str, hypothesis: str) -> float:
    ref_words = reference.split()
    hyp_words = hypothesis.split()
    if len(ref_words) == 0:
        return float("inf") if len(hyp_words) > 0 else 0.0
    # map words to integer ids so the edit distance runs over small ints
    vocab = {}
    for w in ref_words + hyp_words:
        vocab.setdefault(w, len(vocab))
    ref_ids = [vocab[w] for w in ref_words]
    hyp_ids = [vocab[w] for w in hyp_words]
    d = _native.levenshtein_ids(ref_ids, hyp_ids)
    if d < 0:
        d = _levenshtein_py(ref_ids, hyp_ids)
    return d / len(ref_words)


def compute_accuracy(references: List[str], hypotheses: List[str]) -> float:
    total = len(references)
    if total == 0:
        return 0.0
    hits = sum(1 for r, h in zip(references, hypotheses) if r == h)
    return hits / total


def edit_ops(reference: str, hypothesis: str) -> List[tuple]:
    """Minimal-edit alignment operations between two strings.

    Returns the error operations of one optimal Levenshtein alignment —
    ``("sub", ref_ch, hyp_ch)`` / ``("del", ref_ch, None)`` /
    ``("ins", None, hyp_ch)`` — in reference order; matches are omitted.
    This is the ANALYSIS path (character-confusion reports on the eval
    CLI), not the metric hot path: distances come from the native C++
    Levenshtein above, and this Python DP only runs when a report is
    asked for.  Ties break substitution-first, then deletion — one
    deterministic alignment out of the possibly-many optimal ones.
    """
    n, m = len(reference), len(hypothesis)
    prev = list(range(m + 1))
    rows = [prev]
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        rc = reference[i - 1]
        for j in range(1, m + 1):
            cost = rc != hypothesis[j - 1]
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        rows.append(cur)
        prev = cur
    ops: List[tuple] = []
    i, j = n, m
    while i > 0 or j > 0:
        if (
            i > 0
            and j > 0
            and rows[i][j]
            == rows[i - 1][j - 1] + (reference[i - 1] != hypothesis[j - 1])
        ):
            if reference[i - 1] != hypothesis[j - 1]:
                ops.append(("sub", reference[i - 1], hypothesis[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and rows[i][j] == rows[i - 1][j] + 1:
            ops.append(("del", reference[i - 1], None))
            i -= 1
        else:
            ops.append(("ins", None, hypothesis[j - 1]))
            j -= 1
    ops.reverse()
    return ops


def batch_character_error_rate(
    references: List[str], hypotheses: List[str]
) -> List[float]:
    """CER for N pairs with ONE native FFI call (the eval CLI's loop).

    Exact per-pair semantics (`character_error_rate`, incl. the empty-
    reference inf/0 contract); falls back to per-pair calls when the
    native batch entry is unavailable.
    """
    dists = _native.levenshtein_batch(references, hypotheses)
    if dists is None:
        return [
            character_error_rate(r, h)
            for r, h in zip(references, hypotheses)
        ]
    out: List[float] = []
    for dist, r, h in zip(dists, references, hypotheses):
        if len(r) == 0:
            out.append(float("inf") if len(h) > 0 else 0.0)
        else:
            out.append(float(dist) / len(r))
    return out
