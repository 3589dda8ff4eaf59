"""Bigram LM shallow fusion for the attention beam (`rcnn_ocr_tpu/lm.py`).

The reference has no language model at all; fusion is framework-plus.
Contracts tested:

* table math: counts, add-alpha normalization, neutral structural rows;
* save/load roundtrip + charset-order validation;
* ``lm_weight=0`` is exactly the plain beam; a dominant LM steers the
  decode to the LM's preferred chain;
* engine-level parity between ``predict`` and ``predict_serving`` with
  fusion on, and the no-table error path;
* the `tools/train_lm.py` CLI end-to-end.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rcnn_ocr_tpu.lm import (  # noqa: E402
    bigram_counts,
    bigram_logp,
    load_lm,
    save_lm,
    train_bigram_lm,
)
from rcnn_ocr_tpu.vocab.charset import Charset  # noqa: E402

TOKENS = ["<PAD>", "<SOS>", "<EOS>", "a", "b", "c"]
PAD, SOS, EOS, A, B, C = range(6)


@pytest.fixture(scope="module")
def charset():
    return Charset.from_tokens(TOKENS)


def test_bigram_counts(charset):
    counts = bigram_counts(["ab", "ax", "b"], charset)  # 'x' not in charset
    assert counts[SOS, A] == 2  # "ab", "ax"
    assert counts[SOS, B] == 1  # "b"
    assert counts[A, B] == 1  # "ab"
    assert counts[B, EOS] == 2  # "ab", "b" end
    assert counts[A, EOS] == 1  # "ax": 'x' skipped -> a is last
    assert counts.sum() == 7


def test_bigram_logp_normalized_and_neutral(charset):
    logp = bigram_logp(bigram_counts(["abc"], charset), charset, alpha=0.5)
    assert logp.dtype == np.float32
    # every row is a distribution
    np.testing.assert_allclose(
        np.exp(logp.astype(np.float64)).sum(axis=1), 1.0, rtol=1e-6
    )
    # structural rows are exactly uniform (fusion-neutral)
    for r in (PAD, EOS):
        np.testing.assert_allclose(logp[r], np.log(1.0 / len(TOKENS)), rtol=1e-6)
    # observed transition beats unobserved within its row
    assert logp[A, B] > logp[A, C]


def test_lm_roundtrip_and_mismatch(charset, tmp_path):
    logp = train_bigram_lm(["ab", "ba"], charset)
    path = str(tmp_path / "lm.npz")
    save_lm(path, logp, charset.itos)
    np.testing.assert_array_equal(load_lm(path, charset), logp)
    other = Charset.from_tokens(TOKENS[:-1])  # fewer tokens
    with pytest.raises(ValueError, match="charset mismatch"):
        load_lm(path, other)


@pytest.fixture(scope="module")
def tiny_engine(tmp_path_factory):
    """A tiny attention model wrapped in OCRInference (+ its variables)."""
    from flax import serialization

    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.models import RCNN

    tmp = tmp_path_factory.mktemp("lm_engine")
    model = RCNN(
        num_classes=len(TOKENS), hidden_size=16, sos_id=SOS, eos_id=EOS,
        pad_id=PAD, blank_id=None, width_mult=0.25, dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        np.zeros((1, 32, 64, 3), np.float32), train=False, batch_max_length=4,
    )
    blob = {
        "params": serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, variables["params"])
        ),
        "batch_stats": serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
        ),
    }
    ckpt = tmp / "w_weights.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(blob))
    (tmp / "cs.txt").write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    return str(ckpt), str(tmp / "cs.txt"), model, variables


def test_lm_weight_zero_is_plain_beam(tiny_engine):
    from rcnn_ocr_tpu.inference import OCRInference

    ckpt, cs_path, _, _ = tiny_engine
    lm = np.zeros((len(TOKENS), len(TOKENS)), np.float32)  # any table
    imgs = [np.full((20, 50, 3), v, np.uint8) for v in (255, 100)]
    plain = OCRInference(
        ckpt, cs_path, img_h=32, img_w=64, dtype=jnp.float32, verbose=False
    ).predict(imgs, max_length=4, beam_width=3, return_confidence=True)
    with_lm = OCRInference(
        ckpt, cs_path, img_h=32, img_w=64, dtype=jnp.float32, verbose=False,
        lm=lm,
    ).predict(
        imgs, max_length=4, beam_width=3, lm_weight=0.0, return_confidence=True
    )
    assert with_lm == plain


def test_dominant_lm_steers_decode(tiny_engine):
    """With a huge fusion weight the beam must follow the LM's chain."""
    from rcnn_ocr_tpu.inference import OCRInference

    ckpt, cs_path, _, _ = tiny_engine
    # an LM that overwhelmingly prefers 'b' after anything
    lm = np.full((len(TOKENS), len(TOKENS)), -10.0, np.float32)
    lm[:, B] = 0.0
    ocr = OCRInference(
        ckpt, cs_path, img_h=32, img_w=64, dtype=jnp.float32, verbose=False,
        lm=lm,
    )
    img = np.full((20, 50, 3), 255, np.uint8)
    steered = ocr.predict(img, max_length=4, beam_width=4, lm_weight=100.0)
    # every one of the max_length+1 decode steps follows the LM (no EOS)
    assert steered == "b" * 5


def test_serving_fusion_matches_predict(tiny_engine):
    from rcnn_ocr_tpu.inference import OCRInference

    ckpt, cs_path, _, _ = tiny_engine
    lm = train_bigram_lm(["ab", "bc", "ca"], Charset.from_tokens(TOKENS))
    ocr = OCRInference(
        ckpt, cs_path, img_h=32, img_w=64, dtype=jnp.float32, verbose=False,
        lm=lm,
    )
    imgs = [np.full((20, 50, 3), v, np.uint8) for v in (255, 128, 40)]
    ref = ocr.predict(imgs, max_length=4, beam_width=3, lm_weight=0.7)
    srv = ocr.predict_serving(
        imgs, max_length=4, batch_size=4, canvas=(32, 64),
        method="attention_beam", beam_width=3, lm_weight=0.7,
    )
    assert srv == ref


def test_lm_error_paths(tiny_engine):
    from rcnn_ocr_tpu.inference import OCRInference

    ckpt, cs_path, _, _ = tiny_engine
    img = np.full((20, 50, 3), 255, np.uint8)
    ocr = OCRInference(
        ckpt, cs_path, img_h=32, img_w=64, dtype=jnp.float32, verbose=False
    )
    with pytest.raises(ValueError, match="bigram table"):
        ocr.predict(img, max_length=4, beam_width=3, lm_weight=0.5)
    with pytest.raises(ValueError, match="beam_width"):
        ocr.predict(img, max_length=4, lm_weight=0.5)
    # length_penalty in greedy mode is a silent no-op without this guard
    # (ADVICE r3) — same contract predict_serving already enforces
    with pytest.raises(ValueError, match="length_penalty"):
        ocr.predict(img, max_length=4, length_penalty=0.6)
    with pytest.raises(ValueError, match="attention_beam"):
        ocr.predict_serving(img, canvas=(32, 64), lm_weight=0.5)
    with pytest.raises(ValueError):
        OCRInference(
            ckpt, cs_path, img_h=32, img_w=64, dtype=jnp.float32,
            verbose=False, lm=np.zeros((3, 3), np.float32),  # wrong V
        )


def test_ctc_beam_fusion_kernel():
    """Device CTC prefix beam: lm_weight=0 is exact; a prior breaks ties."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.ops.ctc import ctc_beam_search_jax

    V, blank = 6, 0
    # two frames; classes 3 ('a') and 4 ('b') are EXACT ties vs the model
    vals = np.log(np.asarray([[[0.4, 0.3, 0.3], [0.4, 0.3, 0.3]]], np.float32))
    idx = np.asarray([[[blank, 3, 4], [blank, 3, 4]]], np.int32)

    def run(**kw):
        labels, lens, lp = ctc_beam_search_jax(
            jnp.asarray(vals), jnp.asarray(idx), blank_id=blank, beam_width=8,
            **kw,
        )
        return np.asarray(labels), np.asarray(lens), np.asarray(lp)

    base = run()
    zero = run(lm_logp=jnp.zeros((V, V)), lm_weight=0.0, sos_id=SOS)
    for a, b in zip(base, zero):
        np.testing.assert_array_equal(a, b)

    # an LM that strongly prefers 4 after anything must flip the tie to 4
    lm = np.full((V, V), -5.0, np.float32)
    lm[:, 4] = 0.0
    labels, lens, _ = run(lm_logp=jnp.asarray(lm), lm_weight=1.0, sos_id=SOS)
    assert labels[0, : lens[0]].tolist() == [4]
    # and the mirror prior flips it to 3
    lm2 = np.full((V, V), -5.0, np.float32)
    lm2[:, 3] = 0.0
    labels, lens, _ = run(lm_logp=jnp.asarray(lm2), lm_weight=1.0, sos_id=SOS)
    assert labels[0, : lens[0]].tolist() == [3]


@pytest.fixture(scope="module")
def ctc_engine(tmp_path_factory):
    """A tiny CTC-head model wrapped in OCRInference."""
    from flax import serialization

    from rcnn_ocr_tpu.models import RCNN

    tokens = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>", "a", "b", "c"]
    cs = Charset.from_tokens(tokens)
    tmp = tmp_path_factory.mktemp("lm_ctc_engine")
    model = RCNN(
        num_classes=len(tokens), hidden_size=16, sos_id=cs.sos_id,
        eos_id=cs.eos_id, pad_id=cs.pad_id, blank_id=cs.blank_id,
        with_ctc_head=True, ctc_blank_id=cs.ctc_blank_id, width_mult=0.25,
        dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(1)},
        np.zeros((1, 32, 64, 3), np.float32),
        text=np.zeros((1, 5), np.int32), batch_max_length=4,
        method=model.init_all,
    )
    blob = {
        "params": serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, variables["params"])
        ),
        "batch_stats": serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
        ),
    }
    ckpt = tmp / "w_weights.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(blob))
    (tmp / "cs.txt").write_text("\n".join(tokens) + "\n", encoding="utf-8")
    return str(ckpt), str(tmp / "cs.txt"), cs


def test_ctc_engine_fusion(ctc_engine):
    """predict_ctc/serving fusion agree; errors without a table."""
    from rcnn_ocr_tpu.inference import OCRInference

    ckpt, cs_path, cs = ctc_engine
    lm = train_bigram_lm(["ab", "bc"], cs)
    ocr = OCRInference(
        ckpt, cs_path, img_h=32, img_w=64, dtype=jnp.float32, verbose=False,
        lm=lm,
    )
    imgs = [np.full((20, 50, 3), v, np.uint8) for v in (255, 128)]
    fused = ocr.predict_ctc(imgs, method="beam", beam_width=4, lm_weight=0.5)
    srv = ocr.predict_serving(
        imgs, batch_size=2, canvas=(32, 64), method="ctc_beam",
        beam_width=4, lm_weight=0.5,
    )
    assert srv == fused
    # lm_weight=0 equals the plain device beam
    assert ocr.predict_ctc(
        imgs, method="beam", beam_width=4, lm_weight=0.0
    ) == ocr.predict_ctc(imgs, method="beam", beam_width=4)

    bare = OCRInference(
        ckpt, cs_path, img_h=32, img_w=64, dtype=jnp.float32, verbose=False
    )
    with pytest.raises(ValueError, match="bigram table"):
        bare.predict_ctc(imgs, method="beam", beam_width=4, lm_weight=0.5)
    with pytest.raises(ValueError, match="device_beam"):
        bare.predict_ctc(
            imgs, method="beam", device_beam=False, lm_weight=0.5
        )


def test_train_lm_cli(tmp_path, monkeypatch, capsys):
    import csv

    from tools.train_lm import main as lm_main

    (tmp_path / "cs.txt").write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    with open(tmp_path / "labels.csv", "w", newline="", encoding="utf-8") as f:
        wr = csv.writer(f)
        wr.writerow(["img0.png", "ab"])
        wr.writerow(["img1.png", "ba"])
    out = str(tmp_path / "lm.npz")
    monkeypatch.setattr(
        "sys.argv",
        ["train_lm.py", str(tmp_path / "labels.csv"),
         "--charset", str(tmp_path / "cs.txt"), "--out", out],
    )
    assert lm_main() == 0
    assert "6 transitions" in capsys.readouterr().out
    logp = load_lm(out, Charset.from_tokens(TOKENS))
    assert logp.shape == (len(TOKENS), len(TOKENS))
    assert logp[A, B] > logp[A, C]
