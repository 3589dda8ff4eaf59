"""Checkpoint round-trip + inference API tests (CPU, tiny model)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcnn_ocr_tpu.models import RCNN
from rcnn_ocr_tpu.training import checkpoint as ckpt_io
from rcnn_ocr_tpu.training.optim import build_optimizer
from rcnn_ocr_tpu.training.train_step import create_train_state
from rcnn_ocr_tpu.vocab.charset import Charset

TOKENS = ["<PAD>", "<SOS>", "<EOS>", " "] + list("abcdefghij")


@pytest.fixture(scope="module")
def tiny_state():
    model = RCNN(
        num_classes=len(TOKENS), hidden_size=16, width_mult=0.0625, lstm_layers=1,
        with_ctc_head=True, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 64, 3))
    variables = model.init(
        {"params": rng}, x, text=jnp.zeros((1, 5), jnp.int32), batch_max_length=4,
        method=model.init_all,
    )
    tx = build_optimizer("Adam", 1e-3)
    return model, create_train_state(model, variables, tx), tx


def test_checkpoint_roundtrip(tiny_state, tmp_path):
    model, state, tx = tiny_state
    cs = Charset.from_tokens(TOKENS)
    path = str(tmp_path / "last_ckpt.msgpack")
    ckpt_io.save_checkpoint(
        path, state, {"lr": 0.5}, epoch=3, global_step=42, best_val_loss=1.5,
        best_val_acc=0.25, itos=list(cs.itos), stoi=cs.stoi,
        config={"hidden_size": 16}, log_dir="logs",
    )
    blob = ckpt_io.load_checkpoint_blob(path)
    assert blob["epoch"] == 3
    assert blob["global_step"] == 42
    assert blob["itos"] == list(cs.itos)
    assert blob["stoi"]["<EOS>"] == 2
    assert blob["config"]["hidden_size"] == 16
    assert blob["scheduler_state"]["lr"] == 0.5

    restored = ckpt_io.restore_train_state(blob, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state round-trips too
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.opt_state),
        jax.tree_util.tree_leaves(state.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weights_roundtrip(tiny_state, tmp_path):
    model, state, tx = tiny_state
    path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(path, state)
    variables, blob = ckpt_io.load_variables(path)
    assert "params" in variables and "batch_stats" in variables
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["attn"]["w_gen"]),
        np.asarray(state.params["attn"]["w_gen"]),
    )


def test_infer_architecture(tiny_state):
    from rcnn_ocr_tpu.inference import infer_architecture

    model, state, _ = tiny_state
    arch = infer_architecture(state.params)
    assert arch["hidden_size"] == 16
    assert arch["lstm_layers"] == 1
    assert arch["width_mult"] == pytest.approx(0.0625)
    assert arch["num_classes"] == len(TOKENS)
    assert arch["with_ctc_head"] is True


@pytest.mark.slow
def test_inference_api_end_to_end(tiny_state, tmp_path):
    from rcnn_ocr_tpu.inference import OCRInference

    model, state, _ = tiny_state
    cs = Charset.from_tokens(TOKENS)
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "best_acc_weights.msgpack")
    ckpt_io.save_weights(ckpt_path, state)

    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=64, dtype=jnp.float32,
        verbose=False,
    )
    img = np.full((20, 50, 3), 255, np.uint8)

    # single image -> single string
    out = ocr.predict(img, max_length=4, batch_size=2)
    assert isinstance(out, str)
    # list + confidence + batch padding path (3 images, batch 2)
    outs = ocr.predict([img, img, img], max_length=4, batch_size=2, return_confidence=True)
    assert len(outs) == 3
    for text, conf in outs:
        assert isinstance(text, str)
        assert 0.0 <= conf <= 1.0
    # identical inputs decode identically (static-batch padding is masked out)
    assert outs[0][0] == outs[1][0] == outs[2][0]

    # CTC decode paths
    greedy = ocr.predict_ctc([img, img], method="greedy")
    assert len(greedy) == 2 and all(isinstance(t, str) for t in greedy)
    beam = ocr.predict_ctc(img, method="beam", beam_width=4)
    assert isinstance(beam, str)
    # serving with confidence (predict() parity on the fast path)
    serve_conf = ocr.predict_serving(
        [img, img], max_length=4, batch_size=2, canvas=(32, 64),
        return_confidence=True,
    )
    for text, conf in serve_conf:
        assert isinstance(text, str) and 0.0 <= conf <= 1.0
    with pytest.raises(ValueError):
        ocr.predict_serving(
            img, max_length=4, canvas=(32, 64), method="ctc_greedy",
            return_confidence=True,
        )

    # CTC serving path (uint8 letterbox + on-device preprocess + greedy
    # collapse): identical decode to the host-preprocess CTC path on a
    # constant image (interpolation-free)
    serve_ctc = ocr.predict_serving(
        [img, img], max_length=4, batch_size=2, canvas=(32, 64),
        method="ctc_greedy",
    )
    assert serve_ctc == greedy

    # serving beam = the on-device prefix beam fused into the same serving
    # kernel; equals the host-preprocess device beam on a constant image
    serve_beam = ocr.predict_serving(
        [img, img], max_length=4, batch_size=2, canvas=(32, 64),
        method="ctc_beam", beam_width=4, prune_k=5,
    )
    beam_ref = ocr.predict_ctc(
        [img, img], method="beam", beam_width=4, prune_k=5
    )
    assert serve_beam == beam_ref

    # top-k frame pruning (device->host transfer saver): k >= V is exactly
    # the unpruned search; a tight k still returns sane strings
    rng_imgs = [
        (np.random.default_rng(s).uniform(0, 255, (20, 50, 3))).astype(np.uint8)
        for s in range(3)
    ]
    full = ocr.predict_ctc(rng_imgs, method="beam", beam_width=4, prune_k=0)
    exact_k = ocr.predict_ctc(
        rng_imgs, method="beam", beam_width=4, prune_k=len(TOKENS),
        device_beam=False,
    )
    assert exact_k == full
    # device beam vs host beam at the SAME top-k pruning: identical candidate
    # sets and identical missing-class semantics -> identical decodes (the
    # unpruned `full` host run can differ on this near-uniform random-weight
    # model, where blank legitimately falls outside the top-k of a frame)
    dev = ocr.predict_ctc(rng_imgs, method="beam", beam_width=4, prune_k=5)
    host_k = ocr.predict_ctc(
        rng_imgs, method="beam", beam_width=4, prune_k=5, device_beam=False
    )
    assert dev == host_k
    tight = ocr.predict_ctc(rng_imgs, method="beam", beam_width=4, prune_k=3)
    assert len(tight) == 3 and all(isinstance(t, str) for t in tight)

    # PIL input path
    from PIL import Image

    pil = Image.fromarray(img)
    assert isinstance(ocr.predict(pil, max_length=4), str)

    # missing file raises cleanly
    with pytest.raises(FileNotFoundError):
        ocr.predict(str(tmp_path / "missing.png"))


@pytest.mark.slow
def test_predict_serving_matches_predict(tiny_state, tmp_path):
    """The uint8 device-preprocess serving path decodes like predict()."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io

    model, state, _ = tiny_state
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt_path, state)

    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=64, dtype=jnp.float32,
        verbose=False,
    )
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 255, size=(24, 48, 3)).astype(np.uint8),
        rng.integers(0, 255, size=(32, 64, 3)).astype(np.uint8),
    ]
    a = ocr.predict(imgs, max_length=4, batch_size=2)
    b = ocr.predict_serving(imgs, max_length=4, batch_size=2, canvas=(32, 64))
    assert len(b) == 2 and all(isinstance(t, str) for t in b)
    # different resamplers (cv2 vs jax.image) can flip argmaxes on a random
    # model; shapes/API contract are what's asserted here, plus determinism
    assert b == ocr.predict_serving(imgs, max_length=4, batch_size=2, canvas=(32, 64))


@pytest.mark.slow
def test_inference_width_buckets(tiny_state, tmp_path):
    from rcnn_ocr_tpu.inference import OCRInference

    model, state, _ = tiny_state
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io

    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt_path, state)

    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=128,
        width_buckets=[64, 128], dtype=__import__("jax.numpy", fromlist=["x"]).float32,
        verbose=False,
    )
    narrow = np.full((32, 40, 3), 255, np.uint8)  # -> bucket 64
    wide = np.full((32, 120, 3), 255, np.uint8)  # -> bucket 128
    outs = ocr.predict([narrow, wide, narrow], max_length=4, batch_size=2)
    assert len(outs) == 3
    assert all(isinstance(t, str) for t in outs)
    # same image in the same bucket decodes identically regardless of order
    assert outs[0] == outs[2]

    # predict_ctc honors the buckets too (greedy + device beam)
    ctc_outs = ocr.predict_ctc([narrow, wide, narrow], batch_size=2)
    assert len(ctc_outs) == 3 and ctc_outs[0] == ctc_outs[2]
    beam_outs = ocr.predict_ctc(
        [narrow, wide, narrow], batch_size=2, method="beam", beam_width=4
    )
    assert len(beam_outs) == 3 and beam_outs[0] == beam_outs[2]


def test_hpo_builtin_driver(tmp_path):
    from rcnn_ocr_tpu.hpo.driver import run_hpo

    calls = []

    def fake_objective(base, params, trial_dir):
        calls.append(params)
        return -((params["lr"] - 1e-3) ** 2)

    out = run_hpo(
        {"epochs": 1},
        n_trials=5,
        study_name="t",
        storage_dir=str(tmp_path),
        objective=fake_objective,
        space={"lr": ("log", 1e-4, 1e-2), "hidden_size": ("cat", (16, 32))},
        seed=0,
    )
    assert len(out["trials"]) == 5
    assert out["best_params"] is not None
    assert os.path.exists(tmp_path / "t_results.json")
    assert all(p["hidden_size"] in (16, 32) for p in calls)


def test_uint8_ship_matches_float_ship(tiny_state, tmp_path):
    """The greedy/CTC kernels produce identical decodes whether the batch
    arrives as resize-padded uint8 (the shipped default) or as the
    host-normalized float batch of rounds 1-2."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.data.transforms import normalize_unit
    from rcnn_ocr_tpu.inference import OCRInference

    model, state, _ = tiny_state
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt_path, state)
    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=64, dtype=jnp.float32,
        verbose=False,
    )

    rng = np.random.default_rng(1)
    u8 = np.stack([
        ocr._preprocess(rng.integers(0, 256, (20, 50, 3)).astype(np.uint8))
        for _ in range(2)
    ])
    assert u8.dtype == np.uint8  # host side ships unnormalized uint8 now
    f32 = normalize_unit(u8)

    run = ocr._greedy_fn(5)
    pred_u8, maxp_u8 = run(ocr.variables, jnp.asarray(u8))
    pred_f32, maxp_f32 = run(ocr.variables, jnp.asarray(f32))
    assert np.array_equal(np.asarray(pred_u8), np.asarray(pred_f32))
    assert np.array_equal(np.asarray(maxp_u8), np.asarray(maxp_f32))

    ctc = ocr._ctc_fn(True)
    t_u8, v_u8 = ctc(ocr.variables, jnp.asarray(u8))
    t_f32, v_f32 = ctc(ocr.variables, jnp.asarray(f32))
    assert np.array_equal(np.asarray(t_u8), np.asarray(t_f32))
    assert np.array_equal(np.asarray(v_u8), np.asarray(v_f32))


def test_width_buckets_auto_and_canvas_auto(tiny_state, tmp_path):
    """Constructor-level width_buckets='auto:K' resolves from the first
    batch; predict_serving(canvas='auto') sizes the letterbox from data."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference

    model, state, _ = tiny_state
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt_path, state)
    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=64,
        width_buckets="auto:2", dtype=jnp.float32, verbose=False,
    )
    assert ocr.width_buckets is None  # deferred until data is seen

    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, (32, 20, 3)).astype(np.uint8),  # narrow
        rng.integers(0, 256, (32, 60, 3)).astype(np.uint8),  # wide
    ]
    outs = ocr.predict(imgs, max_length=4, batch_size=2)
    assert len(outs) == 2
    assert ocr.width_buckets is not None and len(ocr.width_buckets) <= 2
    assert all(w % 8 == 0 or w == 64 for w in ocr.width_buckets)

    serve = ocr.predict_serving(imgs, max_length=4, batch_size=2, canvas="auto")
    assert len(serve) == 2 and all(isinstance(t, str) for t in serve)

    with pytest.raises(ValueError):
        OCRInference(
            ckpt_path, str(charset_path), width_buckets="bogus", verbose=False
        )


def test_float_ndarray_inputs_are_normalized(tiny_state, tmp_path):
    """Non-uint8 ndarray inputs (0..255-scaled, the reference's A.Normalize
    contract) must decode exactly like their uint8 twins — regression for
    the uint8-feed rewrite, where a float row skipped device_normalize and
    promoted the whole stacked chunk to float32."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference

    model, state, _ = tiny_state
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt_path, state)
    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=64, dtype=jnp.float32,
        verbose=False,
    )

    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (20, 50, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32)  # 0..255-scaled floats
    f64_gray = u8[..., 0].astype(np.float64)  # 2-D float64 (cvtColor-hostile)

    ref = ocr.predict(u8, max_length=4, batch_size=2)
    assert ocr.predict(f32, max_length=4, batch_size=2) == ref
    # a float row mixed into a uint8 chunk must not corrupt either decode
    mixed = ocr.predict([u8, f32], max_length=4, batch_size=2)
    assert mixed == [ref, ref]
    out_gray = ocr.predict(f64_gray, max_length=4, batch_size=2)
    assert isinstance(out_gray, str)
    # the CTC path rides the same _preprocess
    assert ocr.predict_ctc(f32, method="greedy") == ocr.predict_ctc(
        u8, method="greedy"
    )


def test_empty_input_lists_return_empty(tiny_state, tmp_path):
    """Every predict* path returns [] for an empty list — including the
    width_buckets='auto' and canvas='auto' modes, which previously crashed
    in max()/optimal_width_buckets before reaching the chunk loop."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference

    model, state, _ = tiny_state
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt_path, state)
    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=64,
        width_buckets="auto:2", dtype=jnp.float32, verbose=False,
    )
    assert ocr.predict([]) == []
    assert ocr.predict_ctc([]) == []
    assert ocr.predict_serving([], canvas="auto") == []
    assert ocr.width_buckets is None  # auto resolution still deferred


def test_average_checkpoints(tiny_state, tmp_path, monkeypatch, capsys):
    """`tools/average_checkpoints.py`: weighted leaf-wise average, dtype
    preservation, metadata carry-over, and OCRInference loadability."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference
    from tools.average_checkpoints import average_variables, main as avg_main

    model, state, _ = tiny_state
    cs = Charset.from_tokens(TOKENS)
    p1 = str(tmp_path / "a_ckpt.msgpack")
    ckpt_io.save_checkpoint(
        p1, state, None, epoch=1, global_step=1, best_val_loss=1.0,
        best_val_acc=0.0, itos=list(cs.itos), stoi=cs.stoi,
        config={"hidden_size": 16, "img_h": 32, "img_w": 64}, log_dir="logs",
    )
    # a second checkpoint: every param shifted by +1
    import jax

    state2 = state.replace(
        params=jax.tree_util.tree_map(lambda a: a + 1.0, state.params)
    )
    p2 = str(tmp_path / "b_weights.msgpack")
    ckpt_io.save_weights(p2, state2)

    b1 = ckpt_io.load_checkpoint_blob(p1)
    b2 = ckpt_io.load_checkpoint_blob(p2)
    avg = average_variables([b1, b2], [0.25, 0.75])
    leaf1 = np.asarray(b1["params"]["attn"]["w_gen"])
    got = np.asarray(avg["params"]["attn"]["w_gen"])
    np.testing.assert_allclose(got, leaf1 + 0.75, rtol=1e-6, atol=1e-6)
    assert got.dtype == leaf1.dtype

    # architecture mismatch fails loudly
    import pytest as _pytest

    bad = {"params": {"only": np.zeros(3, np.float32)}}
    with _pytest.raises(ValueError, match="architecture"):
        average_variables([b1, bad], [0.5, 0.5])

    # CLI end-to-end: writes a self-describing, OCRInference-loadable file
    out = str(tmp_path / "avg_weights.msgpack")
    monkeypatch.setattr(
        "sys.argv",
        ["average_checkpoints.py", p1, p2, "--out", out, "--weights", "1,1"],
    )
    assert avg_main() == 0
    blob = ckpt_io.load_checkpoint_blob(out)
    assert blob["itos"] == list(cs.itos)  # charset carried from first input
    np.testing.assert_allclose(
        np.asarray(blob["params"]["attn"]["w_gen"]), leaf1 + 0.5,
        rtol=1e-6, atol=1e-6,
    )
    ocr = OCRInference(out, dtype=jnp.float32, verbose=False)  # embedded charset
    img = np.full((20, 50, 3), 255, np.uint8)
    assert isinstance(ocr.predict(img, max_length=4, batch_size=2), str)


def test_average_checkpoints_mixed_batch_stats(tiny_state, tmp_path, capsys):
    """Inputs without batch_stats contribute no mass: the averaged BN
    moments renormalize over the weight that actually accumulated
    (ADVICE r3 — a uniform 3-way average with one stats-less input must
    not scale mean/var by 2/3)."""
    from tools.average_checkpoints import average_variables

    model, state, _ = tiny_state
    p1 = str(tmp_path / "a_weights.msgpack")
    ckpt_io.save_weights(p1, state)
    b_with = ckpt_io.load_checkpoint_blob(p1)
    b_without = {k: v for k, v in b_with.items() if k != "batch_stats"}

    avg = average_variables([b_with, b_without, b_with], [1 / 3, 1 / 3, 1 / 3])
    ref_stats = b_with["batch_stats"]

    def first_leaf(tree):
        for k in sorted(tree):
            v = tree[k]
            return first_leaf(v) if isinstance(v, dict) else np.asarray(v)

    np.testing.assert_allclose(
        first_leaf(avg["batch_stats"]), first_leaf(ref_stats),
        rtol=1e-6, atol=1e-6,
    )
    assert "renormalized" in capsys.readouterr().out

    # mismatched stats trees fail loudly (same contract as params)
    import pytest as _pytest

    bad = dict(b_with)
    bad["batch_stats"] = {"only": np.zeros(3, np.float32)}
    with _pytest.raises(ValueError, match="batch_stats"):
        average_variables([b_with, bad], [0.5, 0.5])


def test_checkpoint_format_version(tiny_state, tmp_path):
    """Every written blob (full ckpt, weights, averaged) is stamped with
    CHECKPOINT_FORMAT_VERSION; a NEWER version is refused loudly by every
    loader; version-less legacy files still load (VERDICT r3 weak #5)."""
    from flax import serialization

    from rcnn_ocr_tpu.training.checkpoint import CHECKPOINT_FORMAT_VERSION

    model, state, _ = tiny_state
    p = str(tmp_path / "v_weights.msgpack")
    ckpt_io.save_weights(p, state)
    blob = ckpt_io.load_checkpoint_blob(p)
    assert blob["format_version"] == CHECKPOINT_FORMAT_VERSION

    # newer-than-loader refuses through the one shared entry point
    blob_future = dict(blob)
    blob_future["format_version"] = CHECKPOINT_FORMAT_VERSION + 1
    fut = str(tmp_path / "future_weights.msgpack")
    with open(fut, "wb") as f:
        f.write(serialization.msgpack_serialize(blob_future))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="newer than this loader"):
        ckpt_io.load_checkpoint_blob(fut)
    with _pytest.raises(ValueError, match="newer than this loader"):
        ckpt_io.load_variables(fut)

    # version-less legacy blobs load as format 1
    legacy = {k: v for k, v in blob.items() if k != "format_version"}
    leg = str(tmp_path / "legacy_weights.msgpack")
    with open(leg, "wb") as f:
        f.write(serialization.msgpack_serialize(legacy))
    variables, _ = ckpt_io.load_variables(leg)
    assert "params" in variables


def test_ckpt_info_tool(tiny_state, tmp_path, monkeypatch, capsys):
    """tools/ckpt_info.py describes both blob kinds from the msgpack
    alone and mirrors the loader's version gate (exit 0 readable / 1
    corrupt / 2 newer-than-this-tree)."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    try:
        import ckpt_info as ci
    finally:
        _sys.path.remove("/root/repo/tools")

    model, state, tx = tiny_state
    cs = Charset.from_tokens(TOKENS)
    full = str(tmp_path / "full_ckpt.msgpack")
    ckpt_io.save_checkpoint(
        full, state, None, epoch=2, global_step=7, best_val_loss=1.0,
        best_val_acc=0.5, itos=list(cs.itos), stoi=cs.stoi,
        config={"img_h": 32, "img_w": 64, "hidden_size": 16}, log_dir="l",
    )
    info = ci.ckpt_info(full)
    assert info["kind"] == "full_checkpoint" and info["readable"]
    assert info["format_version"] == ckpt_io.CHECKPOINT_FORMAT_VERSION
    assert info["epoch"] == 2 and info["charset_size"] == len(TOKENS)
    assert info["params"]["params"] > 0 and info["has_batch_stats"]
    assert info["config"]["hidden_size"] == 16

    weights = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(weights, state)
    winfo = ci.ckpt_info(weights)
    assert winfo["kind"] == "weights" and "epoch" not in winfo

    monkeypatch.setattr(_sys, "argv", ["ckpt_info.py", full])
    assert ci.main() == 0
    assert "full_checkpoint" in capsys.readouterr().out

    # a future-format blob is reported and refused, like load_checkpoint
    from flax import serialization

    blob = serialization.msgpack_restore(open(full, "rb").read())
    blob["format_version"] = ckpt_io.CHECKPOINT_FORMAT_VERSION + 1
    fut = str(tmp_path / "future.msgpack")
    open(fut, "wb").write(serialization.msgpack_serialize(blob))
    monkeypatch.setattr(_sys, "argv", ["ckpt_info.py", fut])
    assert ci.main() == 2
    assert "NEWER" in capsys.readouterr().out

    monkeypatch.setattr(
        _sys, "argv", ["ckpt_info.py", str(tmp_path / "nope.msgpack")]
    )
    assert ci.main() == 1


def test_serving_beam_knob_validation_and_prune_k_full_vocab(
    tiny_state, tmp_path
):
    """Round-4 review fixes: (a) prune_k<=0 on the serving ctc_beam means
    the FULL vocabulary (a top_k(0) kernel silently decoded everything to
    ''), and identical kernels share a cache entry regardless of unused
    prune_k values; (b) beam methods refuse beam_width<=1 (the greedy
    kernel would run and its output be mis-decoded as beam results);
    (c) the public kernel accessors refuse knobs they would drop."""
    from rcnn_ocr_tpu.inference import OCRInference

    model, state, _ = tiny_state
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt_path, state)
    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=64,
        dtype=jnp.float32, verbose=False,
    )
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (24, 40, 3)).astype(np.uint8) for _ in range(2)]

    # prune_k=0 == full vocabulary == any k >= num_classes
    full = ocr.predict_serving(
        imgs, max_length=4, batch_size=2, canvas=(32, 64),
        method="ctc_beam", beam_width=4, prune_k=0,
    )
    clamped = ocr.predict_serving(
        imgs, max_length=4, batch_size=2, canvas=(32, 64),
        method="ctc_beam", beam_width=4, prune_k=999,
    )
    assert full == clamped
    # ...and the two calls shared ONE kernel cache entry (no re-compile
    # for byte-identical kernels under different unused prune_k spellings)
    keys = [k for k in ocr._jit_cache if k[0] == "serving"]
    assert len(keys) == 1

    # beam methods refuse a width that would silently run greedy
    with pytest.raises(ValueError, match="beam_width > 1"):
        ocr.predict_serving(
            imgs, canvas=(32, 64), method="attention_beam", beam_width=0,
        )
    with pytest.raises(ValueError, match="beam_width > 1"):
        ocr.predict_serving(
            imgs, canvas=(32, 64), method="ctc_beam", beam_width=1,
        )
    with pytest.raises(ValueError, match="beam_width > 1"):
        ocr.serving_kernel(method="attention_beam", beam_width=1)

    # public kernel accessors refuse knobs they would drop
    with pytest.raises(ValueError, match="lm_weight"):
        ocr.serving_kernel(method="attention", lm_weight=0.5)
    with pytest.raises(ValueError, match="length_penalty"):
        ocr.serving_kernel(method="ctc_beam", beam_width=4, length_penalty=1.0)
    with pytest.raises(ValueError, match="fusion hook"):
        ocr.decode_kernel(beam_width=0, lm_weight=0.5)
    with pytest.raises(ValueError, match="length_penalty"):
        ocr.decode_kernel(beam_width=1, length_penalty=2.0)


def test_auto_buckets_not_locked_by_single_warmup_image(tiny_state, tmp_path):
    """A one-image call (the documented daemon warm-up) must not pin the
    auto bucket set — and once resolved, the widest bucket is the full
    engine width so wide images are never squeezed (round-4 review)."""
    from rcnn_ocr_tpu.inference import OCRInference

    model, state, _ = tiny_state
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(TOKENS) + "\n", encoding="utf-8")
    ckpt_path = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt_path, state)
    ocr = OCRInference(
        ckpt_path, str(charset_path), img_h=32, img_w=64,
        width_buckets="auto:2", dtype=jnp.float32, verbose=False,
    )
    rng = np.random.default_rng(1)
    narrow = rng.integers(0, 256, (32, 12, 3)).astype(np.uint8)

    # warm-up: one narrow image — decodes fine, resolution still deferred
    ocr.predict(narrow, max_length=4)
    assert ocr.width_buckets is None

    wide = rng.integers(0, 256, (32, 60, 3)).astype(np.uint8)
    ocr.predict([narrow, wide], max_length=4, batch_size=2)
    assert ocr.width_buckets is not None
    assert max(ocr.width_buckets) == 64  # the full engine width


def test_load_model_accepts_stoi_alone(tiny_state, tmp_path):
    """The docstring promises 'pass itos/stoi or charset_path' — stoi
    alone used to be silently ignored and raise 'charset required'
    (round-4 review).  The token order rebuilds from the id mapping."""
    from rcnn_ocr_tpu.utils.common import load_model

    model, state, _ = tiny_state
    ckpt = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt, state)
    stoi = {t: i for i, t in enumerate(TOKENS)}
    _, variables, charset = load_model(ckpt, stoi=stoi, hidden_size=16)
    assert list(charset.itos) == TOKENS
    assert "params" in variables
