"""Numerical parity of the JAX model vs the reference PyTorch model.

The reference repo (read-only at /root/reference) is used as a test oracle:
we instantiate its architecture with random weights in torch-CPU, import
the state_dict through `rcnn_ocr_tpu.interop.torch_import`, and assert the
JAX forward matches end-to-end.  This de-risks VA parity (>= 0.912 with the
reference checkpoint) without the original dataset.

Skipped when the reference tree or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")

if not os.path.isdir(REFERENCE):  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_model_cls():
    """Import the reference RCNN class (stubbing torchvision.ops.DropBlock2d)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        class DropBlock2d(torch.nn.Identity):
            def __init__(self, p=0.0, block_size=5):
                super().__init__()

        tv_ops.DropBlock2d = DropBlock2d
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    sys.path.insert(0, REFERENCE)
    try:
        from model.model import RCNN as TorchRCNN  # noqa: PLC0415
    finally:
        sys.path.remove(REFERENCE)
    return TorchRCNN


NUM_CLASSES = 14
HIDDEN = 32
MAX_LEN = 5


@pytest.fixture(scope="module")
def models(ref_model_cls):
    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.interop import import_torch_state_dict
    from rcnn_ocr_tpu.models import RCNN as JaxRCNN

    torch.manual_seed(0)
    tmodel = ref_model_cls(
        num_classes=NUM_CLASSES, hidden_size=HIDDEN, sos_id=1, eos_id=2, pad_id=0,
        blank_id=None,
    )
    tmodel.eval()

    variables = import_torch_state_dict(
        tmodel.state_dict(), num_classes=NUM_CLASSES, hidden_size=HIDDEN
    )
    jmodel = JaxRCNN(
        num_classes=NUM_CLASSES, hidden_size=HIDDEN, sos_id=1, eos_id=2, pad_id=0,
        blank_id=None, dtype=jnp.float32,
    )

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 64, 3)).astype(np.float32)
    return tmodel, jmodel, variables, x


def test_encoder_parity(models):
    tmodel, jmodel, variables, x = models
    with torch.no_grad():
        t_enc = tmodel.encode(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_enc = np.asarray(jmodel.apply(variables, x, train=False, method=jmodel.encode))
    np.testing.assert_allclose(j_enc, t_enc, rtol=1e-4, atol=2e-4)


def test_teacher_forced_parity(models):
    tmodel, jmodel, variables, x = models
    rng = np.random.default_rng(2)
    text = rng.integers(3, NUM_CLASSES, size=(2, MAX_LEN + 1)).astype(np.int64)
    text[:, 0] = 1  # SOS
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            text=torch.from_numpy(text),
            is_train=True,
            batch_max_length=MAX_LEN,
        ).numpy()
    j_logits = np.asarray(
        jmodel.apply(
            variables, x, text=text.astype(np.int32), train=False,
            batch_max_length=MAX_LEN,
        )
    )
    assert j_logits.shape == t_logits.shape
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=5e-4)


def test_greedy_parity(models):
    tmodel, jmodel, variables, x = models
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            is_train=False,
            batch_max_length=MAX_LEN,
        ).numpy()
    j_logits = np.asarray(
        jmodel.apply(variables, x, train=False, batch_max_length=MAX_LEN)
    )
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=5e-4)
    # decoded argmax sequences must agree exactly
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))


def test_import_checkpoint_layouts(models, tmp_path):
    tmodel = models[0]
    from rcnn_ocr_tpu.interop import import_torch_checkpoint

    sd = tmodel.state_dict()
    # bare state_dict
    p1 = tmp_path / "bare.pth"
    torch.save(sd, p1)
    out1 = import_torch_checkpoint(str(p1))
    assert out1["num_classes"] == NUM_CLASSES
    # legacy model_state_dict
    p2 = tmp_path / "legacy.pth"
    torch.save({"model_state_dict": sd, "hidden_size": HIDDEN}, p2)
    out2 = import_torch_checkpoint(str(p2))
    assert out2["hidden_size"] == HIDDEN
    # full checkpoint with charset + config
    p3 = tmp_path / "full.pth"
    itos = ["<PAD>", "<SOS>", "<EOS>"] + list("abcdefghijk")
    torch.save(
        {
            "model_state": sd,
            "itos": itos,
            "stoi": {s: i for i, s in enumerate(itos)},
            "config": {"hidden_size": HIDDEN},
        },
        p3,
    )
    out3 = import_torch_checkpoint(str(p3))
    assert out3["itos"] == itos
    assert out3["hidden_size"] == HIDDEN
    for out in (out1, out2, out3):
        a = out["variables"]["params"]["attn"]["w_gen"]
        b = out1["variables"]["params"]["attn"]["w_gen"]
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_trained_oracle_decode_agreement(ref_model_cls, tmp_path):
    """Decode parity with a TRAINED torch oracle (not random init).

    Trains the reference model for a short, fully deterministic run on
    synthetic lines, imports the weights, and asserts greedy decode-string
    agreement + identical exact-match accuracy between torch and JAX in
    fp32.  Trained weights have near-tie logits (the regime where
    XLA-vs-torch numerics could flip argmaxes); random-weight parity alone
    does not cover it.  A longer offline run lives in
    tools/train_reference_oracle.py (results recorded in PARITY.md).
    """
    import cv2
    import jax.numpy as jnp
    import torch.nn.functional as F

    from rcnn_ocr_tpu.interop import import_torch_state_dict
    from rcnn_ocr_tpu.models import RCNN as JaxRCNN
    from rcnn_ocr_tpu.vocab.charset import (
        Charset, decode_tokens, pack_attention_targets,
    )
    from tests.helpers import render_text_image

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    alphabet = "abcdefgh"
    tokens = ["<PAD>", "<SOS>", "<EOS>"] + list(alphabet)
    cs = Charset.from_tokens(tokens)
    max_len = 4

    def make(n, seed):
        r = np.random.default_rng(seed)
        imgs, labels = [], []
        for _ in range(n):
            k = int(r.integers(1, 4))
            s = "".join(r.choice(list(alphabet), size=k))
            img = render_text_image(s, h=32, w=64, rng=r)
            imgs.append((img.astype(np.float32) / 255.0 - 0.5) / 0.5)
            labels.append(s)
        return np.stack(imgs), labels

    x_train, y_train = make(96, 1)
    x_val, y_val = make(128, 2)
    text_in, target_y, _ = pack_attention_targets(y_train, cs.stoi, max_len)

    hidden = 128
    tmodel = ref_model_cls(
        num_classes=cs.num_classes, hidden_size=hidden,
        sos_id=cs.sos_id, eos_id=cs.eos_id, pad_id=cs.pad_id, blank_id=None,
    )
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
    xt = torch.from_numpy(x_train.transpose(0, 3, 1, 2))
    ti = torch.from_numpy(text_in.astype(np.int64))
    ty = torch.from_numpy(target_y.astype(np.int64))
    n_train = len(y_train)
    order = rng.permutation(n_train)
    pos = 0
    for step in range(100):
        if pos + 8 > n_train:
            order = rng.permutation(n_train)
            pos = 0
        idx = torch.from_numpy(order[pos : pos + 8].copy())
        pos += 8
        logits = tmodel(xt[idx], text=ti[idx], is_train=True, batch_max_length=max_len)
        loss = F.cross_entropy(
            logits.reshape(-1, cs.num_classes), ty[idx].reshape(-1),
            ignore_index=cs.pad_id,
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
    assert float(loss.detach()) < 2.0  # weights moved well away from init

    tmodel.eval()
    with torch.no_grad():
        t_logits = tmodel(
            torch.from_numpy(x_val.transpose(0, 3, 1, 2)),
            is_train=False, batch_max_length=max_len,
        ).numpy()

    variables = import_torch_state_dict(
        tmodel.state_dict(), num_classes=cs.num_classes, hidden_size=hidden
    )
    jmodel = JaxRCNN(
        num_classes=cs.num_classes, hidden_size=hidden,
        sos_id=cs.sos_id, eos_id=cs.eos_id, pad_id=cs.pad_id, blank_id=None,
        dtype=np.float32,
    )
    import jax

    j_logits = np.asarray(
        jax.jit(
            lambda v, im: jmodel.apply(v, im, train=False, batch_max_length=max_len)
        )(variables, jnp.asarray(x_val))
    )

    def dec(rows):
        return [
            decode_tokens(r, list(cs.itos), cs.pad_id, cs.eos_id, cs.blank_id)
            for r in rows.argmax(-1)
        ]

    t_dec, j_dec = dec(t_logits), dec(j_logits)
    agree = sum(a == b for a, b in zip(t_dec, j_dec))
    # trained-weight agreement: ZERO decode flips in fp32 over 128 held-out
    # images (matches the full-scale hidden-256 certification in PARITY.md)
    assert agree == len(t_dec), [
        (a, b) for a, b in zip(t_dec, j_dec) if a != b
    ]
    # the headline metric must be IDENTICAL
    t_acc = sum(p == t for p, t in zip(t_dec, y_val))
    j_acc = sum(p == t for p, t in zip(j_dec, y_val))
    assert t_acc == j_acc


def test_pth_calibration_roundtrip(models, tmp_path):
    """save_calibration() on a .pth source embeds charset + sizes so the
    calibrated msgpack re-opens standalone on the static int8 path."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference

    tmodel = models[0]
    itos = ["<PAD>", "<SOS>", "<EOS>"] + list("abcdefghijk")
    assert len(itos) == NUM_CLASSES
    p = tmp_path / "full.pth"
    torch.save(
        {
            "model_state": tmodel.state_dict(),
            "itos": itos,
            "stoi": {s: i for i, s in enumerate(itos)},
            "config": {"hidden_size": HIDDEN, "img_h": 32, "img_w": 64},
        },
        p,
    )
    ocr = OCRInference(str(p), quantize=True, dtype=jnp.float32, verbose=False)
    imgs = [
        np.random.default_rng(s).integers(0, 256, (32, 64, 3)).astype(np.uint8)
        for s in range(2)
    ]
    ocr.calibrate(imgs, batch_size=2)
    out = tmp_path / "calibrated.msgpack"
    ocr.save_calibration(str(out))

    # standalone reopen: no charset_path, sizes from the embedded config
    ocr2 = OCRInference(str(out), quantize=True, dtype=jnp.float32, verbose=False)
    assert ocr2.model.act_quant == "static"
    assert ocr2.img_h == 32 and ocr2.img_w == 64
    assert list(ocr2.charset.itos) == itos
    assert ocr2.predict(imgs, max_length=4, batch_size=2) == ocr.predict(
        imgs, max_length=4, batch_size=2
    )
