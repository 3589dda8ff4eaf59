"""Character bigram language model for beam-search shallow fusion.

The reference stack has no LM at all; OCR serving pipelines routinely add
one because the visual model's near-tie errors (``rn``/``m``, ``0``/``O``)
are exactly where a cheap character prior pays.  A bigram table is the
TPU-sweet-spot design: fusion inside the device beam is ONE ``[B, K]``
row-gather from a ``[V, V]`` table per step (`models/attention.py:
_beam_search`) — no second network, no host round-trips, no effect on the
greedy path.

Token ids are the charset's: row = previous token (``<SOS>`` row holds the
start-of-word distribution), column = next token.  Counts come from the
same labels CSVs training uses; add-alpha smoothing keeps unseen pairs
finite.  The ``<PAD>``/``<EOS>``/``<BLANK>`` ROWS are uniform (their
successors are decoder-structural — fusion adds the same constant to
every hypothesis there).  The ``last -> <EOS>`` COLUMN is deliberately
kept informative: where a line plausibly ENDS is in-domain signal (high
after word-final characters, low mid-word), so fusion participates in
the stop decision with the same weight as any other transition — this
is the behavior the lm-weight sweeps measured (PERF.md).

Build offline with `tools/train_lm.py`; pass to ``OCRInference`` via
``lm="lm.npz"`` + per-call ``lm_weight``.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np


def bigram_counts(
    texts: Iterable[str],
    charset,
) -> np.ndarray:
    """Accumulate ``[V, V]`` transition counts from label strings.

    Characters missing from the charset are skipped (matching the target
    packer's behavior for unknown characters); each label contributes
    ``<SOS> -> first`` and ``last -> <EOS>`` transitions so the table
    carries start/stop statistics too.
    """
    V = charset.num_classes
    counts = np.zeros((V, V), np.float64)
    stoi = charset.stoi
    sos, eos = charset.sos_id, charset.eos_id
    for text in texts:
        prev = sos
        for ch in text:
            cur = stoi.get(ch)
            if cur is None:
                continue
            counts[prev, cur] += 1.0
            prev = cur
        counts[prev, eos] += 1.0
    return counts


def bigram_logp(
    counts: np.ndarray,
    charset,
    alpha: float = 1.0,
) -> np.ndarray:
    """Counts -> row-normalized ``log P(next | prev)`` with add-``alpha``.

    Rows with no mass (and the ``<PAD>``/``<EOS>`` rows, whose successors
    are decoder-structural, plus the ``<BLANK>`` CTC token if present) are
    exactly uniform — adding a constant per step, i.e. fusion-neutral.
    The ``<EOS>`` COLUMN stays informative by design (see the module
    docstring): stop statistics are part of the prior being fused.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (add-alpha smoothing)")
    V = counts.shape[0]
    counts = counts.astype(np.float64) + alpha
    neutral_rows = [charset.pad_id, charset.eos_id]
    if charset.blank_id is not None:
        neutral_rows.append(charset.blank_id)
    for r in neutral_rows:
        counts[r, :] = 1.0
    logp = np.log(counts) - np.log(counts.sum(axis=1, keepdims=True))
    return logp.astype(np.float32)


def train_bigram_lm(
    texts: Iterable[str],
    charset,
    alpha: float = 1.0,
) -> np.ndarray:
    """One-call convenience: label strings -> fusion-ready ``[V, V]`` table."""
    return bigram_logp(bigram_counts(texts, charset), charset, alpha=alpha)


def save_lm(path: str, logp: np.ndarray, itos) -> None:
    """Write the table + its charset (token order is part of the contract)."""
    np.savez_compressed(
        path, logp=logp.astype(np.float32), itos=np.asarray(list(itos), object)
    )


def load_lm(path: str, charset=None) -> np.ndarray:
    """Load a saved table; verifies token order against ``charset`` if given."""
    with np.load(path, allow_pickle=True) as z:
        logp = z["logp"]
        itos = [str(t) for t in z["itos"]]
    if charset is not None and itos != list(charset.itos):
        raise ValueError(
            f"LM charset mismatch: table was built for {len(itos)} tokens, "
            f"engine charset has {charset.num_classes} (or different order)"
        )
    return np.asarray(logp, np.float32)
