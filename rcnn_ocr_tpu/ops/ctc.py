"""CTC loss and decoding (greedy + prefix beam search).

The reference shipped only *dead* CTC utilities
(`/root/reference/training/utils.py:122-162`: a Python greedy collapse with
the `alphabet[p-1]` off-by-one convention, never called).  Here CTC is a
first-class head:

* loss: `optax.ctc_loss` (XLA-fused forward-backward on device);
* greedy decode: argmax on device, vectorized collapse (dedupe repeats,
  drop blank) either as pure NumPy on host or as a jnp op for fully
  on-device pipelines;
* beam search: the native C++ prefix beam search
  (:mod:`rcnn_ocr_tpu.native`) with a pure-Python fallback.

Blank handling is charset-driven: callers pass ``Charset.ctc_blank_id``
(the explicit ``<BLANK>`` token when the charset defines one, else
``<PAD>``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import optax

from rcnn_ocr_tpu import native


def ctc_loss(
    logits: jnp.ndarray,  # [B, T, V]
    logit_paddings: jnp.ndarray,  # [B, T] 1.0 where padded
    labels: jnp.ndarray,  # [B, L]
    label_paddings: jnp.ndarray,  # [B, L] 1.0 where padded
    blank_id: int = 0,
    valid: Optional[jnp.ndarray] = None,  # [B] bool; False rows excluded
) -> jnp.ndarray:
    """Mean per-sequence CTC negative log-likelihood.

    ``valid`` masks statically padded batch rows *out of the mean* — a row
    with zero valid frames but a non-empty label is an impossible alignment
    and optax would charge it ~1e5, poisoning the loss.
    """
    per_seq = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=blank_id
    )
    if valid is None:
        return jnp.mean(per_seq)
    v = valid.astype(per_seq.dtype)
    return jnp.sum(per_seq * v) / jnp.maximum(jnp.sum(v), 1.0)


def ctc_greedy_collapse_np(
    pred_ids: np.ndarray,  # [B, T] argmax class ids
    blank_id: int,
    lengths: Optional[np.ndarray] = None,
) -> List[List[int]]:
    """Collapse per-frame argmaxes: drop repeats, then drop blanks (host)."""
    pred_ids = np.asarray(pred_ids)
    batch, t_steps = pred_ids.shape
    out: List[List[int]] = []
    for b in range(batch):
        t_valid = int(lengths[b]) if lengths is not None else t_steps
        row = pred_ids[b, :t_valid]
        if t_valid == 0:
            out.append([])
            continue
        keep = np.ones(t_valid, dtype=bool)
        keep[1:] = row[1:] != row[:-1]  # drop repeats
        collapsed = row[keep]
        out.append(collapsed[collapsed != blank_id].tolist())
    return out


def ctc_greedy_decode_jnp(
    logits: jnp.ndarray,  # [B, T, V]
    blank_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully on-device greedy decode.

    Returns ``(tokens, valid)``: ``tokens`` [B, T] holds the collapsed label
    ids left-packed (padded with ``blank_id``), ``valid`` [B] the counts.
    Left-packing uses a stable cumsum-scatter — no dynamic shapes, safe
    under jit and pjit.
    """
    pred = jnp.argmax(logits, axis=-1)  # [B, T]
    prev = jnp.concatenate([jnp.full_like(pred[:, :1], -1), pred[:, :-1]], axis=1)
    keep = (pred != blank_id) & (pred != prev)  # new non-blank symbols
    batch, t_steps = pred.shape
    # left-pack kept elements via a stable argsort of (dropped-flag, t):
    # kept columns sort before dropped ones, order preserved — cheaper on
    # TPU than a scatter for these tiny [B, T] shapes
    t_idx = jnp.broadcast_to(jnp.arange(t_steps, dtype=jnp.int32), pred.shape)
    order = jnp.argsort(jnp.where(keep, t_idx, t_idx + t_steps), axis=1)
    packed = jnp.take_along_axis(pred, order, axis=1)
    valid = jnp.sum(keep.astype(jnp.int32), axis=1)
    tokens = jnp.where(t_idx < valid[:, None], packed, blank_id)
    return tokens, valid


def _ctc_beam_py(
    log_probs: np.ndarray, blank: int, beam_width: int
) -> Tuple[List[int], float]:
    """Pure-Python prefix beam search (fallback when native lib is absent)."""
    t_steps, _ = log_probs.shape
    neg_inf = -np.inf
    beams = {(): (0.0, neg_inf)}  # prefix -> (log p ending blank, ending non-blank)
    for t in range(t_steps):
        row = log_probs[t]
        nxt: dict = {}

        def add(prefix, pb=neg_inf, pnb=neg_inf):
            old = nxt.get(prefix, (neg_inf, neg_inf))
            nxt[prefix] = (np.logaddexp(old[0], pb), np.logaddexp(old[1], pnb))

        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            add(prefix, pb=total + row[blank])
            if prefix:
                add(prefix, pnb=pnb + row[prefix[-1]])
            for c in np.argsort(row)[::-1][: beam_width + 1]:
                c = int(c)
                if c == blank:
                    continue
                ext = prefix + (c,)
                if prefix and c == prefix[-1]:
                    add(ext, pnb=pb + row[c])
                else:
                    add(ext, pnb=total + row[c])
        beams = dict(
            sorted(nxt.items(), key=lambda kv: -np.logaddexp(*kv[1]))[:beam_width]
        )
    best, (pb, pnb) = max(beams.items(), key=lambda kv: np.logaddexp(*kv[1]))
    return list(best), float(np.logaddexp(pb, pnb))


def ctc_beam_search(
    logits: np.ndarray,  # [B, T, V] raw logits or log-probs
    blank_id: int,
    beam_width: int = 16,
    lengths: Optional[np.ndarray] = None,
    already_log_probs: bool = False,
) -> Tuple[List[List[int]], np.ndarray]:
    """Batched prefix beam search on host (native C++ when available)."""
    logits = np.asarray(logits, dtype=np.float32)
    if already_log_probs:
        log_probs = logits
    else:
        m = logits.max(axis=-1, keepdims=True)
        log_probs = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))

    got = native.ctc_beam_search_batch(
        log_probs, blank=blank_id, beam_width=beam_width, lengths=lengths
    )
    if got is not None:
        return got
    labels: List[List[int]] = []
    lps = np.zeros((log_probs.shape[0],), np.float32)
    for b in range(log_probs.shape[0]):
        t_valid = int(lengths[b]) if lengths is not None else log_probs.shape[1]
        lab, lp = _ctc_beam_py(log_probs[b, :t_valid], blank_id, beam_width)
        labels.append(lab)
        lps[b] = lp
    return labels, lps


def ids_to_text(
    label_rows: Sequence[Sequence[int]],
    itos: Sequence[str],
    skip_ids: Sequence[int] = (),
) -> List[str]:
    """Collapsed CTC label ids -> strings (specials dropped)."""
    skip = set(skip_ids)
    return [
        "".join(itos[int(t)] for t in row if int(t) not in skip) for row in label_rows
    ]
