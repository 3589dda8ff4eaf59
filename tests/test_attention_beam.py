"""Attention-head beam search (`AttentionDecoder._beam_search`).

The reference decodes its seq2seq head greedily only
(`/root/reference/model/model.py:91-112`); the framework adds a device-side
beam.  Correctness contract tested here:

* ``beam_width=1`` reproduces greedy decoding exactly;
* with ``beam_width >= |search space|`` the beam finds the true global
  maximum-score sequence (verified against exhaustive enumeration with the
  same EOS-freeze scoring semantics);
* the best beam's score is always >= the greedy sequence's score.
"""

import itertools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rcnn_ocr_tpu.models import RCNN  # noqa: E402

VOCAB = 6  # <PAD>, <SOS>, <EOS>, a, b, c
HIDDEN = 16
MAX_LEN = 3  # steps = 4
PAD, SOS, EOS = 0, 1, 2


@pytest.fixture(scope="module")
def tiny():
    model = RCNN(
        num_classes=VOCAB, hidden_size=HIDDEN, sos_id=SOS, eos_id=EOS, pad_id=PAD,
        blank_id=None, width_mult=0.25, dtype=jnp.float32,
    )
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (3, 32, 32, 3)), np.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False, batch_max_length=MAX_LEN
    )
    return model, variables, x


def greedy_tokens_and_score(model, variables, x):
    logits = np.asarray(
        model.apply(variables, x, train=False, batch_max_length=MAX_LEN)
    )  # [B, steps, V]
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    toks = logits.argmax(-1)  # [B, steps]
    # greedy score under the beam's EOS-freeze semantics: sum log-probs of
    # emitted tokens up to and including the first EOS
    scores = []
    for b in range(toks.shape[0]):
        s, done = 0.0, False
        for t in range(toks.shape[1]):
            if not done:
                s += float(logp[b, t, toks[b, t]])
                if toks[b, t] == EOS:
                    done = True
        scores.append(s)
    return toks, np.asarray(scores, np.float32)


def test_beam1_equals_greedy(tiny):
    model, variables, x = tiny
    g_toks, g_scores = greedy_tokens_and_score(model, variables, x)
    b_toks, b_scores = jax.tree_util.tree_map(
        np.asarray,
        model.apply(
            variables, x, beam_width=1, batch_max_length=MAX_LEN,
            method=model.beam_decode,
        ),
    )
    # greedy keeps argmax-decoding past EOS; the beam freezes to PAD — the
    # decoded *strings* are identical, so compare through the first EOS
    for b in range(g_toks.shape[0]):
        row_g, row_b = g_toks[b], b_toks[b]
        if EOS in row_g:
            e = int(np.argmax(row_g == EOS))
            np.testing.assert_array_equal(row_b[: e + 1], row_g[: e + 1])
            assert (row_b[e + 1 :] == PAD).all()
        else:
            np.testing.assert_array_equal(row_b, row_g)
    np.testing.assert_allclose(b_scores, g_scores, rtol=1e-5, atol=1e-5)


def test_beam_score_dominates_greedy(tiny):
    model, variables, x = tiny
    _, g_scores = greedy_tokens_and_score(model, variables, x)
    for k in (2, 4):
        _, b_scores = jax.tree_util.tree_map(
            np.asarray,
            model.apply(
                variables, x, beam_width=k, batch_max_length=MAX_LEN,
                method=model.beam_decode,
            ),
        )
        assert (b_scores >= g_scores - 1e-5).all(), (k, b_scores, g_scores)


def _exhaustive_best(model, variables, x):
    """Brute-force the true max-score sequence per row.

    Enumerates every canonical token sequence of length ``steps`` (EOS-freeze
    applied: tokens after the first EOS are forced PAD at log-prob 0, so
    non-canonical tails are score-equivalent and skipped), scoring each by
    teacher-forcing it through the decoder — the same conditional
    distributions the beam expands.  The encoder runs ONCE; all sequences
    are scored in one batched decoder pass.
    """
    steps = MAX_LEN + 1
    B = x.shape[0]
    seqs = []
    for seq in itertools.product(range(VOCAB), repeat=steps):
        seq = np.asarray(seq, np.int32)
        if EOS in seq:
            e = int(np.argmax(seq == EOS))
            if np.any(seq[e + 1 :] != PAD):
                continue  # non-canonical duplicate of the frozen form
        seqs.append(seq)
    seqs = np.stack(seqs)  # [N, steps]
    n = len(seqs)

    enc = np.asarray(
        model.apply(variables, x, train=False, method=model.encode)
    )  # [B, T, C]
    enc_rep = np.repeat(enc, n, axis=0)  # row-major: (b, seq) pairs
    text = np.zeros((B * n, steps + 1), np.int32)
    text[:, 0] = SOS
    text[:, 1:] = np.tile(seqs, (B, 1))
    logits = np.asarray(
        model.apply(
            variables, enc_rep, text=text, train=False, batch_max_length=MAX_LEN,
            method=lambda m, e, **kw: m.attn(e, **kw),
        )
    )  # [B*n, steps, V]
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    logp = logp.reshape(B, n, steps, VOCAB)

    # per-sequence score with the freeze rule (vectorized over B and n)
    tiled = np.tile(seqs[None], (B, 1, 1))  # [B, n, steps]
    tok_lp = np.take_along_axis(logp, tiled[..., None], axis=-1)[..., 0]
    seen_eos = np.cumsum(tiled == EOS, axis=-1) > 0
    live = np.concatenate(
        [np.ones_like(seen_eos[..., :1]), ~seen_eos[..., :-1]], axis=-1
    )  # include the EOS step itself, freeze after
    scores = (tok_lp * live).sum(-1)  # [B, n]
    best = scores.argmax(1)
    return seqs[best], scores[np.arange(B), best].astype(np.float32)


def test_serving_attention_beam_matches_predict(tiny, tmp_path):
    """`predict_serving(method="attention_beam")` == `predict(beam_width=K)`.

    Same search behind the on-device preprocess; constant images make the
    host and device preprocess interpolation-free, so the decodes (and the
    geometric-mean confidences) must agree exactly.
    """
    from flax import serialization

    from rcnn_ocr_tpu.inference import OCRInference

    model, variables, _ = tiny
    tokens = ["<PAD>", "<SOS>", "<EOS>", "a", "b", "c"]
    (tmp_path / "cs.txt").write_text("\n".join(tokens) + "\n", encoding="utf-8")
    blob = {
        "params": serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, variables["params"])
        ),
        "batch_stats": serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
        ),
    }
    ckpt = tmp_path / "w_weights.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(blob))

    ocr = OCRInference(
        str(ckpt), str(tmp_path / "cs.txt"), img_h=32, img_w=64,
        dtype=jnp.float32, verbose=False,
    )
    imgs = [np.full((20, 50, 3), v, np.uint8) for v in (255, 128, 40)]
    ref = ocr.predict(
        imgs, max_length=MAX_LEN, batch_size=4, beam_width=4,
        return_confidence=True,
    )
    serve = ocr.predict_serving(
        imgs, max_length=MAX_LEN, batch_size=4, canvas=(32, 64),
        method="attention_beam", beam_width=4, return_confidence=True,
    )
    for (t_ref, c_ref), (t_srv, c_srv) in zip(ref, serve):
        assert t_srv == t_ref
        assert c_srv == pytest.approx(c_ref, abs=1e-5)
    # without confidence: plain strings, same decodes
    plain = ocr.predict_serving(
        imgs, max_length=MAX_LEN, batch_size=4, canvas=(32, 64),
        method="attention_beam", beam_width=4,
    )
    assert plain == [t for t, _ in ref]

    # length_penalty threads through to the same rank normalization the
    # direct predict path applies (score / len**p), for every p
    for p in (0.0, 0.6):
        lp_ref = ocr.predict(
            imgs, max_length=MAX_LEN, batch_size=4, beam_width=4,
            length_penalty=p,
        )
        lp_srv = ocr.predict_serving(
            imgs, max_length=MAX_LEN, batch_size=4, canvas=(32, 64),
            method="attention_beam", beam_width=4, length_penalty=p,
        )
        assert lp_srv == lp_ref
    # and only the attention beam accepts it
    with pytest.raises(ValueError, match="length_penalty"):
        ocr.predict_serving(
            imgs, batch_size=4, canvas=(32, 64),
            method="attention", length_penalty=0.5,
        )


@pytest.mark.slow
def test_full_beam_matches_exhaustive(tiny):
    model, variables, x = tiny
    ex_toks, ex_scores = _exhaustive_best(model, variables, x)
    # K = V^steps upper-bounds the live-hypothesis count at every step, so
    # the beam provably never drops a finite candidate -> exact search
    K = VOCAB ** (MAX_LEN + 1)
    b_toks, b_scores = jax.tree_util.tree_map(
        np.asarray,
        model.apply(
            variables, x, beam_width=K, batch_max_length=MAX_LEN,
            method=model.beam_decode,
        ),
    )
    np.testing.assert_allclose(b_scores, ex_scores, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(b_toks, ex_toks)
