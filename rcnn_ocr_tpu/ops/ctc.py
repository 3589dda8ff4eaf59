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

import jax
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

    Rows whose label cannot be aligned at all — required frames
    ``label_len + adjacent_repeats`` exceed the available time steps — are
    likewise excluded: CTC assigns them zero probability by construction
    (optax charges ``-log_epsilon`` ≈ 1e5 each), so under width bucketing a
    few dense lines in a short bucket would otherwise dominate the batch
    loss and its gradient.  Bucket assignment avoids this when labels are
    known (`data/loader.py:lift_buckets_for_ctc`); the mask here is the
    backstop for any feed.
    """
    per_seq = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=blank_id
    )
    lab_real = 1.0 - label_paddings  # [B, L] 1.0 on real label positions
    lab_len = jnp.sum(lab_real, axis=1)
    repeats = jnp.sum(
        (labels[:, 1:] == labels[:, :-1]).astype(per_seq.dtype)
        * lab_real[:, 1:] * lab_real[:, :-1],
        axis=1,
    )
    frames = jnp.sum(1.0 - logit_paddings, axis=1)
    feasible = (lab_len + repeats <= frames).astype(per_seq.dtype)
    v = feasible if valid is None else feasible * valid.astype(per_seq.dtype)
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
    return_confidence: bool = False,
):
    """Fully on-device greedy decode.

    Returns ``(tokens, valid)``: ``tokens`` [B, T] holds the collapsed label
    ids left-packed (padded with ``blank_id``), ``valid`` [B] the counts.
    Left-packing uses a stable cumsum-scatter — no dynamic shapes, safe
    under jit and pjit.

    ``return_confidence`` appends a float32 ``conf`` [B] row — the mean
    max-softmax probability over the EMITTED frames (non-blank, non-repeat:
    the frames that produced the text), the CTC twin of the reference's
    attention confidence contract (`/root/reference/inference.py:169-188`,
    mean max-softmax over decoded steps).  An empty decode falls back to
    the mean max-softmax over ALL frames (the model's confidence that the
    line is blank).  One [B] fp32 row — the 30k img/s fetch shape is
    otherwise unchanged.
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
    if not return_confidence:
        return tokens, valid
    # max softmax prob per frame, in fp32: exp(max - logsumexp)
    lg = logits.astype(jnp.float32)
    maxp = jnp.exp(jnp.max(lg, axis=-1) - jax.nn.logsumexp(lg, axis=-1))
    emitted = jnp.sum(jnp.where(keep, maxp, 0.0), axis=1) / jnp.maximum(
        valid.astype(jnp.float32), 1.0
    )
    all_frames = jnp.mean(maxp, axis=1)
    conf = jnp.where(valid > 0, emitted, all_frames)
    return tokens, valid, conf


def ctc_beam_search_jax(
    top_vals: jnp.ndarray,  # [B, T, K] top-k frame log-probs (device)
    top_idx: jnp.ndarray,  # [B, T, K] their class ids
    blank_id: int,
    beam_width: int = 16,
    lengths: Optional[jnp.ndarray] = None,  # [B] valid frame counts
    lm_logp: Optional[jnp.ndarray] = None,  # [V, V] bigram log P(next|prev)
    lm_weight: float = 0.0,  # shallow-fusion weight on label extensions
    sos_id: int = 1,  # LM row for the empty prefix (start distribution)
    return_posterior: bool = False,  # + winner posterior among final beams
):
    """Fully on-device batched CTC prefix beam search.

    TPU-native formulation of the same search the host C++ runs
    (`native/ctc_beam.cpp`), vectorized over batch AND beams under one
    ``lax.scan`` over frames — the per-image host loop (430 img/s on one
    core) becomes a single device kernel.  Consumes the already-shipped
    top-k frame candidates (classes outside the top-k are treated as
    -inf, exactly like the host path's pruned dense rebuild).

    Key structural fact that makes merging vectorizable: beams are
    deduplicated every step, so candidate prefixes collide in groups of AT
    MOST TWO — a same-prefix candidate (beam j unextended) and a child
    candidate (beam i extended by c where prefix_i + c == prefix_j).  The
    merge is therefore one masked pairwise match on rolling prefix hashes
    (two independent 32-bit channels; collision odds ~2^-64 per pair), not
    a segmented reduction.

    Returns ``(labels [B, T], lengths [B], log_probs [B])`` — labels are
    left-packed, padded with ``blank_id``.

    ``lm_logp`` enables bigram shallow fusion (`rcnn_ocr_tpu/lm.py`):
    label-EXTENSION candidates gain ``lm_weight * lm_logp[last, c]``
    (the empty prefix reads the ``sos_id`` start row); blank/repeat
    transitions emit no label and carry no bonus, so merge partners always
    share identical accumulated LM mass and the pairwise fold stays exact.
    With fusion on the returned ``log_probs`` are the fused objective.
    """
    import jax
    from jax import lax

    top_vals = top_vals.astype(jnp.float32)
    top_idx = top_idx.astype(jnp.int32)
    b_sz, t_steps, k = top_vals.shape
    w = int(beam_width)
    neg_inf = jnp.float32(-jnp.inf)
    lm_c = lm_t = None
    if lm_logp is not None and lm_weight:
        lm_c = jnp.asarray(lm_logp, jnp.float32) * jnp.float32(lm_weight)
        lm_t = lm_c.T  # [next, prev]: contiguous row-gathers by class id

    # rolling-hash constants (odd multipliers, independent channels)
    m1 = jnp.uint32(2654435761)
    m2 = jnp.uint32(2246822519)

    def child_hash(h1, h2, c):
        cc = (c + 2).astype(jnp.uint32)
        return h1 * m1 + cc, h2 * m2 + cc

    # beam state (per batch row): top-W prefixes
    init = dict(
        pb=jnp.full((b_sz, w), neg_inf).at[:, 0].set(0.0),
        pnb=jnp.full((b_sz, w), neg_inf),
        # beam 0 = the empty prefix; dead beams get distinct garbage hashes
        h1=jnp.broadcast_to(
            (jnp.arange(w, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9))
            | jnp.uint32(1),
            (b_sz, w),
        ),
        h2=jnp.broadcast_to(
            (jnp.arange(w, dtype=jnp.uint32) * jnp.uint32(0x85EBCA6B))
            | jnp.uint32(1),
            (b_sz, w),
        ),
        last=jnp.full((b_sz, w), -1, jnp.int32),
        length=jnp.zeros((b_sz, w), jnp.int32),
        labels=jnp.full((b_sz, w, t_steps), blank_id, jnp.int32),
    )

    frame_t = jnp.arange(t_steps)
    valid_t = (
        jnp.full((b_sz,), t_steps, jnp.int32)
        if lengths is None
        else jnp.asarray(lengths, jnp.int32)
    )

    def step(state, frame):
        vals, idx, t = frame  # [B, K], [B, K], scalar
        pb, pnb = state["pb"], state["pnb"]
        total = jnp.logaddexp(pb, pnb)  # [B, W]

        # per-beam gathers from the pruned frame row (absent class = -inf,
        # matching the host path's dense rebuild semantics)
        blank_lp = jnp.max(
            jnp.where(idx == blank_id, vals, neg_inf), axis=1
        )  # [B]
        last_lp = jnp.max(
            jnp.where(
                idx[:, None, :] == state["last"][:, :, None], vals[:, None, :],
                neg_inf,
            ),
            axis=2,
        )  # [B, W]

        # same-prefix candidates: blank extension + repeat-last (no gap)
        same_pb = total + blank_lp[:, None]  # [B, W]
        same_pnb = pnb + last_lp  # -inf at the root (last = -1)

        # child candidates: beam i extended by class c (blank masked out)
        is_rep = idx[:, None, :] == state["last"][:, :, None]  # [B, W, K]
        base = jnp.where(is_rep, pb[:, :, None], total[:, :, None])
        child_pnb = base + vals[:, None, :]
        if lm_c is not None:
            # fusion bonus on the emitted label only (blank/repeat carry
            # none).  Formulated for the TPU: gather the K candidate
            # COLUMNS as contiguous rows of lm.T, then select each beam's
            # prev-row with a one-hot matmul on the MXU — scattered
            # (prev, class) pair-gathers measured 1.6-2x the whole kernel.
            prev = jnp.where(state["last"] < 0, sos_id, state["last"])
            cols = lm_t[idx]  # [B, K, Vprev]
            oh = jax.nn.one_hot(prev, lm_c.shape[0], dtype=jnp.float32)
            bonus = jnp.einsum(
                "bwv,bkv->bwk", oh, cols, preferred_element_type=jnp.float32
            )
            child_pnb = child_pnb + bonus
        child_pnb = jnp.where(idx[:, None, :] == blank_id, neg_inf, child_pnb)
        ch1, ch2 = child_hash(
            state["h1"][:, :, None], state["h2"][:, :, None], idx[:, None, :]
        )  # [B, W, K]

        # merge: a child that IS an existing beam's prefix folds into that
        # beam's same-prefix candidate (groups have size <= 2, see docstring)
        match = (state["h1"][:, :, None, None] == ch1[:, None, :, :]) & (
            state["h2"][:, :, None, None] == ch2[:, None, :, :]
        )  # [B, Wsame, Wchild, K]
        folded = jnp.max(
            jnp.where(match, child_pnb[:, None, :, :], neg_inf), axis=(2, 3)
        )  # [B, W] — max == logsumexp here: <=1 child can match a prefix
        same_pnb = jnp.logaddexp(same_pnb, folded)
        child_alive = ~jnp.any(match, axis=1)  # [B, Wchild, K]
        child_pnb = jnp.where(child_alive, child_pnb, neg_inf)

        # pool same + child candidates, keep the top W by total prob
        pool_pb = jnp.concatenate(
            [same_pb, jnp.full((b_sz, w * k), neg_inf)], axis=1
        )
        pool_pnb = jnp.concatenate(
            [same_pnb, child_pnb.reshape(b_sz, w * k)], axis=1
        )
        pool_total = jnp.logaddexp(pool_pb, pool_pnb)
        _, keep = lax.top_k(pool_total, w)  # [B, W] indices into the pool

        is_child = keep >= w
        src = jnp.where(is_child, (keep - w) // k, keep)  # source beam
        slot = jnp.where(is_child, (keep - w) % k, 0)  # candidate class slot
        c_new = jnp.take_along_axis(idx, slot, axis=1)  # [B, W]

        take = lambda a: jnp.take_along_axis(a, src, axis=1)
        old_len = take(state["length"])
        old_labels = jnp.take_along_axis(
            state["labels"], src[:, :, None], axis=1
        )
        nh1, nh2 = child_hash(take(state["h1"]), take(state["h2"]), c_new)
        appended = jnp.where(
            frame_t[None, None, :] == old_len[:, :, None],
            c_new[:, :, None],
            old_labels,
        )
        new = dict(
            pb=jnp.take_along_axis(pool_pb, keep, axis=1),
            pnb=jnp.take_along_axis(pool_pnb, keep, axis=1),
            h1=jnp.where(is_child, nh1, take(state["h1"])),
            h2=jnp.where(is_child, nh2, take(state["h2"])),
            last=jnp.where(is_child, c_new, take(state["last"])),
            length=old_len + is_child.astype(jnp.int32),
            labels=jnp.where(is_child[:, :, None], appended, old_labels),
        )
        # rows whose valid frames are exhausted keep their state
        active = (t < valid_t)[:, None]
        out = {
            key: jnp.where(
                active[:, :, None] if new[key].ndim == 3 else active,
                new[key],
                state[key],
            )
            for key in state
        }
        return out, None

    frames = (
        jnp.swapaxes(top_vals, 0, 1),
        jnp.swapaxes(top_idx, 0, 1),
        jnp.arange(t_steps, dtype=jnp.int32),
    )
    state, _ = lax.scan(step, init, frames)

    total = jnp.logaddexp(state["pb"], state["pnb"])
    best = jnp.argmax(total, axis=1)  # [B]
    labels = jnp.take_along_axis(
        state["labels"], best[:, None, None], axis=1
    )[:, 0]
    out_len = jnp.take_along_axis(state["length"], best[:, None], axis=1)[:, 0]
    out_lp = jnp.take_along_axis(total, best[:, None], axis=1)[:, 0]
    if not return_posterior:
        return labels, out_len, out_lp
    # winner's normalized posterior among the W surviving prefixes — the
    # beam-CTC confidence contract (dead beams sit at -inf and drop out)
    posterior = jnp.exp(out_lp - jax.nn.logsumexp(total, axis=1))
    return labels, out_len, out_lp, posterior


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
    finals = np.array([np.logaddexp(pb_, pnb_) for pb_, pnb_ in beams.values()])
    m = float(finals.max())
    total = m + float(np.log(np.exp(finals - m).sum()))
    return list(best), float(np.logaddexp(pb, pnb)), total


def ctc_beam_search(
    logits: np.ndarray,  # [B, T, V] raw logits or log-probs
    blank_id: int,
    beam_width: int = 16,
    lengths: Optional[np.ndarray] = None,
    already_log_probs: bool = False,
    return_totals: bool = False,
):
    """Batched prefix beam search on host (native C++ when available).

    ``return_totals`` appends the per-row logsumexp over the final beams'
    totals, so callers can form the winner's normalized posterior
    ``exp(best - total)`` — the same beam-confidence contract as the
    device search (``ctc_beam_search_jax(return_posterior=True)``).
    """
    logits = np.asarray(logits, dtype=np.float32)
    if already_log_probs:
        log_probs = logits
    else:
        m = logits.max(axis=-1, keepdims=True)
        log_probs = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))

    got = native.ctc_beam_search_batch(
        log_probs, blank=blank_id, beam_width=beam_width, lengths=lengths,
        want_totals=return_totals,
    )
    if got is not None:
        return got
    labels: List[List[int]] = []
    lps = np.zeros((log_probs.shape[0],), np.float32)
    totals = np.zeros((log_probs.shape[0],), np.float32)
    for b in range(log_probs.shape[0]):
        t_valid = int(lengths[b]) if lengths is not None else log_probs.shape[1]
        lab, lp, tot = _ctc_beam_py(log_probs[b, :t_valid], blank_id, beam_width)
        labels.append(lab)
        lps[b] = lp
        totals[b] = tot
    if return_totals:
        return labels, lps, totals
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


def ctc_beam_from_logits(
    logits: jnp.ndarray,  # [B, T, V] CTC head outputs
    *,
    blank_id: int,
    beam_width: int,
    prune_k: int,  # top-k frame candidates the beam considers (>= 1)
    lm_logp=None,  # [V, V] bigram log P(next|prev) or None
    lm_weight: float = 0.0,
    sos_id: int = 1,
    return_confidence: bool = False,
) -> tuple:
    """log-softmax -> top-k frame pruning -> device prefix beam.

    The ONE sequence every on-device CTC beam caller runs (`predict_ctc`'s
    kernel and the serving/export kernel), factored so the pruning and
    fusion semantics cannot diverge between paths.  Returns
    ``(labels [B, T], lengths [B])`` — plus the winner's normalized
    posterior among the final beams [B] with ``return_confidence``.
    """
    import jax

    if prune_k < 1:
        raise ValueError(f"prune_k must be >= 1 inside a kernel, got {prune_k}")
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(log_probs, prune_k)
    out = ctc_beam_search_jax(
        vals,
        idx.astype(jnp.int32),
        blank_id=blank_id,
        beam_width=beam_width,
        lm_logp=lm_logp,
        lm_weight=lm_weight,
        sos_id=sos_id,
        return_posterior=return_confidence,
    )
    if return_confidence:
        labels, lens, _, posterior = out
        return labels, lens, posterior.astype(jnp.float32)
    labels, lens, _ = out
    return labels, lens
