"""End-to-end training integration on a tiny synthetic dataset (CPU).

Covers the reference's training-loop contract (SURVEY.md §4): loss
decreases over epochs, checkpoints/metrics CSV/TB event files appear, and
resume restores counters and continues.
"""

import json
import os

import numpy as np
import pytest

from rcnn_ocr_tpu.training.config import Config
from rcnn_ocr_tpu.training.train import run_training
from tests.helpers import make_synthetic_dataset, tiny_labels

CHARSET_TOKENS = ["<PAD>", "<SOS>", "<EOS>", " "] + list("abcdefghij")


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train_env")
    charset_path = tmp / "charset.txt"
    charset_path.write_text("\n".join(CHARSET_TOKENS) + "\n", encoding="utf-8")
    labels = tiny_labels(32)
    csv_path, root = make_synthetic_dataset(str(tmp / "data"), labels)
    return {"tmp": tmp, "charset": str(charset_path), "csv": csv_path, "root": root}


def _base_cfg(env, exp_dir, **overrides):
    cfg = {
        "train_csvs": [env["csv"]],
        "train_roots": [env["root"]],
        "charset_path": env["charset"],
        "img_h": 32,
        "img_w": 64,
        "max_len": 6,
        "hidden_size": 32,
        "width_mult": 0.125,
        "batch_size": 8,
        "epochs": 2,
        "lr": 1e-3,
        "val_size": 8,
        "eval_every": 1,
        "seed": 0,
        "compute_dtype": "float32",
        "use_pallas": False,
        "exp_dir": exp_dir,
        "num_workers": 2,
    }
    cfg.update(overrides)
    return Config(cfg)


@pytest.mark.slow
def test_training_end_to_end_and_resume(tiny_env):
    exp_dir = str(tiny_env["tmp"] / "exp_e2e")
    cfg = _base_cfg(tiny_env, exp_dir)
    result = run_training(cfg)

    assert np.isfinite(result["val_loss"])
    assert 0.0 <= result["val_acc"] <= 1.0
    assert result["exp_dir"] == exp_dir
    # artifacts
    for name in (
        "config.json",
        "train.log",
        "metrics_epoch.csv",
        "last_ckpt.msgpack",
        "last_weights.msgpack",
        "best_loss_ckpt.msgpack",
        "best_acc_ckpt.msgpack",
    ):
        assert os.path.exists(os.path.join(exp_dir, name)), name
    # TB event files
    logs = os.listdir(os.path.join(exp_dir, "logs"))
    assert any("tfevents" in f for f in logs)
    # metrics rows: header + 2 epochs
    rows = open(os.path.join(exp_dir, "metrics_epoch.csv"), encoding="utf-8").read().strip().splitlines()
    assert len(rows) == 3

    # loss decreased across epochs on this trivially overfittable set
    import csv as csv_mod

    parsed = list(csv_mod.DictReader(rows))
    assert float(parsed[-1]["train_loss"]) < float(parsed[0]["train_loss"])

    # --- resume: epochs=4 continues from epoch 3 ---
    cfg2 = Config({"resume_path": exp_dir, "epochs": 4, "num_workers": 2})
    assert cfg2.exp_dir == exp_dir
    result2 = run_training(cfg2)
    rows2 = open(os.path.join(exp_dir, "metrics_epoch.csv"), encoding="utf-8").read().strip().splitlines()
    assert len(rows2) == 5  # header + epochs 1..4 (resume appended 3 and 4)
    assert np.isfinite(result2["val_loss"])


@pytest.mark.slow
def test_training_ctc_head(tiny_env):
    """CRNN configuration: attention-free CTC-only model trains end-to-end
    and its checkpoint serves through predict_ctc (the reference's dead
    `load_crnn` path, live here — /root/reference/training/utils.py:70-119)."""
    import jax.numpy as jnp

    exp_dir = str(tiny_env["tmp"] / "exp_ctc")
    cfg = _base_cfg(tiny_env, exp_dir, head="ctc", epochs=1)
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])

    from rcnn_ocr_tpu.inference import OCRInference

    ocr = OCRInference(
        os.path.join(exp_dir, "last_ckpt.msgpack"),
        dtype=jnp.float32,
        verbose=False,
    )
    assert ocr.model.with_ctc_head and not ocr.model.with_attention_head
    img = np.full((20, 50, 3), 255, np.uint8)
    out = ocr.predict_ctc([img, img], method="greedy")
    assert len(out) == 2 and all(isinstance(t, str) for t in out)
    with pytest.raises(ValueError):
        ocr.predict(img)  # no attention head on a CRNN checkpoint


@pytest.mark.slow
def test_training_both_heads_and_proportions(tiny_env, tmp_path):
    # second synthetic set to exercise proportional mixing
    labels2 = tiny_labels(16, seed=3)
    csv2, root2 = make_synthetic_dataset(str(tmp_path / "ds2"), labels2)
    exp_dir = str(tmp_path / "exp_both")
    cfg = _base_cfg(
        tiny_env,
        exp_dir,
        head="both",
        epochs=1,
        train_proportions=[0.5, 0.5],
        val_size=4,
    )
    cfg.train_csvs = [tiny_env["csv"], csv2]
    cfg.train_roots = [tiny_env["root"], root2]
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])


@pytest.mark.slow
def test_training_profile_trace_and_log_cadence(tiny_env):
    """profile_steps captures an XLA trace dir; log_every gates step scalars."""
    exp_dir = str(tiny_env["tmp"] / "exp_prof")
    cfg = _base_cfg(
        tiny_env, exp_dir, epochs=1, profile_steps=1, log_every=2, progress=False
    )
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])
    profile_dir = os.path.join(exp_dir, "profile")
    assert os.path.isdir(profile_dir)
    # jax.profiler writes plugins/profile/<run>/ under the trace dir
    assert any(files for _, _, files in os.walk(profile_dir))


@pytest.mark.slow
def test_training_device_augment(tiny_env):
    """device_augment=True: uint8 host batches, augmentation inside the
    jitted step; loss stays finite and decreases."""
    exp_dir = str(tiny_env["tmp"] / "exp_devaug")
    cfg = _base_cfg(tiny_env, exp_dir, epochs=2, device_augment=True, progress=False)
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])
    import csv as csv_mod

    rows = open(os.path.join(exp_dir, "metrics_epoch.csv"), encoding="utf-8").read().strip().splitlines()
    parsed = list(csv_mod.DictReader(rows))
    assert float(parsed[-1]["train_loss"]) < float(parsed[0]["train_loss"])


@pytest.mark.slow
def test_training_grad_accum(tiny_env):
    """grad_accum=2: one optimizer update per loader batch, microbatches
    scanned inside the jitted step; loss stays finite and decreases."""
    exp_dir = str(tiny_env["tmp"] / "exp_gaccum")
    cfg = _base_cfg(
        tiny_env, exp_dir, epochs=2, grad_accum=2, device_augment=True,
        progress=False,
    )
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])
    import csv as csv_mod

    rows = open(os.path.join(exp_dir, "metrics_epoch.csv"), encoding="utf-8").read().strip().splitlines()
    parsed = list(csv_mod.DictReader(rows))
    assert float(parsed[-1]["train_loss"]) < float(parsed[0]["train_loss"])


@pytest.mark.slow
def test_training_ema(tiny_env):
    """ema_decay: training runs, validation uses the EMA weights, and the
    weights slots deploy the EMA params (== the full ckpt's ema_params)."""
    from flax import serialization

    from rcnn_ocr_tpu.training import checkpoint as ckpt_io

    exp_dir = str(tiny_env["tmp"] / "exp_ema")
    cfg = _base_cfg(tiny_env, exp_dir, epochs=2, ema_decay=0.9, progress=False)
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])

    ckpt = ckpt_io.load_checkpoint_blob(os.path.join(exp_dir, "last_ckpt.msgpack"))
    assert "ema_params" in ckpt
    weights = ckpt_io.load_checkpoint_blob(
        os.path.join(exp_dir, "last_weights.msgpack")
    )
    # the deployed weights are the EMA tree, not the raw params
    ema_leaves = serialization.to_state_dict(ckpt["ema_params"])
    raw_leaves = serialization.to_state_dict(ckpt["params"])
    w_leaves = serialization.to_state_dict(weights["params"])

    def flat(d, prefix=""):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from flat(v, prefix + k + "/")
            else:
                yield prefix + k, np.asarray(v)

    ema_f, raw_f, w_f = dict(flat(ema_leaves)), dict(flat(raw_leaves)), dict(flat(w_leaves))
    assert set(ema_f) == set(w_f)
    any_diff = False
    for k in w_f:
        np.testing.assert_array_equal(w_f[k], ema_f[k])
        any_diff = any_diff or not np.array_equal(w_f[k], raw_f[k])
    assert any_diff  # EMA actually lags the raw params after training


@pytest.mark.slow
def test_training_graceful_preemption(tiny_env, monkeypatch):
    """SIGTERM mid-training checkpoints and exits cleanly (SURVEY §5.3).

    The signal is raised deterministically from inside the hot loop (via the
    per-step timer hook) once the handler is guaranteed installed; the loop
    must write the 'last' slot, flag the result, restore the previous
    handler, and the checkpoint must resume.
    """
    import signal

    from rcnn_ocr_tpu.utils.profiling import StepTimer

    exp_dir = str(tiny_env["tmp"] / "exp_preempt")
    cfg = _base_cfg(tiny_env, exp_dir, epochs=10, async_checkpoint=False)

    sentinel_handler = lambda s, f: None  # noqa: E731
    prev = signal.signal(signal.SIGTERM, sentinel_handler)
    calls = {"n": 0}
    orig_stop = StepTimer.stop

    def patched_stop(self, n):
        calls["n"] += 1
        if calls["n"] == 4:  # mid-epoch-2 (3 train batches per epoch)
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_stop(self, n)

    monkeypatch.setattr(StepTimer, "stop", patched_stop)
    try:
        result = run_training(cfg)
    finally:
        restored = signal.getsignal(signal.SIGTERM)
        signal.signal(signal.SIGTERM, prev)

    assert result.get("preempted") is True
    assert restored is sentinel_handler  # run_training restored our handler
    assert calls["n"] < 10  # stopped long before the 10 epochs' ~30 steps
    ckpt_path = os.path.join(exp_dir, "last_ckpt.msgpack")
    assert os.path.exists(ckpt_path)

    from rcnn_ocr_tpu.training.checkpoint import load_checkpoint_blob

    blob = load_checkpoint_blob(ckpt_path)
    assert blob["epoch"] == 1  # interrupted epoch 2 -> resume re-runs it
    assert blob["global_step"] == 4

    # the preempted checkpoint resumes (and now runs to completion)
    cfg2 = Config({"resume_path": exp_dir, "epochs": 3, "num_workers": 2})
    result2 = run_training(cfg2)
    assert result2.get("preempted") is None
    assert np.isfinite(result2["val_loss"])


def test_single_encode_eval_step_matches_multi_pass():
    """`make_eval_step` now encodes ONCE and feeds all heads
    (RCNN.eval_outputs).  Eval is deterministic — no dropout, BN running
    stats — so the shared-encoder step must reproduce the reference-shaped
    multi-pass validation (separate full forwards per output,
    /root/reference/training/train.py:554-576) to numerical identity
    (VERDICT r3 weak #1: the old docstring claimed sharing costs parity —
    it does not)."""
    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.ops.augment import device_normalize
    from rcnn_ocr_tpu.ops.ctc import ctc_loss as ctc_loss_fn
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import (
        create_train_state,
        make_eval_step,
        masked_token_ce,
    )

    max_len, pad_id, blank = 6, 0, 3
    model = RCNN(
        num_classes=len(CHARSET_TOKENS), hidden_size=32, width_mult=0.125,
        with_ctc_head=True, ctc_blank_id=blank, dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 32, 64, 3)),
        text=jnp.zeros((2, max_len + 1), jnp.int32),
        batch_max_length=max_len, method=model.init_all,
    )
    state = create_train_state(model, variables, build_optimizer("Adam", 1e-3))

    rng = np.random.default_rng(1)
    B = 4
    batch = {
        "image": rng.integers(0, 256, (B, 32, 64, 3)).astype(np.uint8),
        "text_in": rng.integers(0, len(CHARSET_TOKENS), (B, max_len + 1)).astype(np.int32),
        "target_y": rng.integers(0, len(CHARSET_TOKENS), (B, max_len + 1)).astype(np.int32),
        "ctc_labels": rng.integers(4, len(CHARSET_TOKENS), (B, max_len)).astype(np.int32),
        "ctc_paddings": np.zeros((B, max_len), np.float32),
        "valid": np.ones((B,), bool),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    got = make_eval_step(
        model, max_len, pad_id, head="both", ctc_blank_id=blank
    )(state, batch)

    # reference-shaped multi-pass step: three separate full forwards
    x = device_normalize(batch["image"])
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    tf_logits = model.apply(
        vs, x, text=batch["text_in"], train=False, batch_max_length=max_len
    )
    greedy_logits = model.apply(vs, x, train=False, batch_max_length=max_len)
    ctc_logits = model.apply(vs, x, train=False, method=model.ctc_logits)
    want_loss = masked_token_ce(tf_logits, batch["target_y"], pad_id, batch["valid"])
    lp = jnp.zeros(ctc_logits.shape[:2], jnp.float32)
    want_ctc = ctc_loss_fn(
        ctc_logits, lp, batch["ctc_labels"], batch["ctc_paddings"], blank,
        valid=batch["valid"],
    )

    np.testing.assert_allclose(
        np.asarray(got["val_loss"]), np.asarray(want_loss), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["ctc_val_loss"]), np.asarray(want_ctc), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(got["pred_ids"]), np.asarray(jnp.argmax(greedy_logits, -1))
    )
    np.testing.assert_array_equal(
        np.asarray(got["ctc_frame_ids"]), np.asarray(jnp.argmax(ctc_logits, -1))
    )


@pytest.mark.slow
def test_training_exports_serving_artifact(tiny_env):
    """`export_artifact` in the config is the train-to-deploy handoff:
    training ends by exporting the requested checkpoint slot as a serving
    artifact, and the artifact decodes identically to a live engine on
    the same slot.  A typo'd block must fail BEFORE any epoch runs."""
    import jax

    from rcnn_ocr_tpu.export import ServingArtifact
    from rcnn_ocr_tpu.inference import OCRInference

    exp_dir = str(tiny_env["tmp"] / "exp_export")
    cfg = _base_cfg(
        tiny_env, exp_dir, head="both", epochs=1,
        # EMA on: the artifact must carry the DEPLOY weights (the EMA
        # tree validation measured — the weights slot), not the full
        # checkpoint's raw params (round-4 review)
        ema_decay=0.5,
        export_artifact={
            "method": "ctc_greedy", "slot": "last",
            "canvas": [32, 64], "batch_size": 4, "max_length": 6,
        },
    )
    result = run_training(cfg)
    art_dir = result["artifact_dir"]
    assert art_dir == os.path.join(exp_dir, "artifact")
    manifest = __import__("json").load(
        open(os.path.join(art_dir, "manifest.json"), encoding="utf-8")
    )
    assert manifest["method"] == "ctc_greedy"

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (24, 48, 3), np.uint8) for _ in range(3)]
    art = ServingArtifact.load(art_dir)
    # the handoff exports with the serving default dtype (bf16) — the
    # equality engine must match it; weights blobs carry no config, so
    # geometry comes explicitly (like the handoff itself)
    live = OCRInference(
        os.path.join(exp_dir, "last_weights.msgpack"),
        tiny_env["charset"], img_h=32, img_w=64, verbose=False,
    )
    assert art.predict(imgs) == live.predict_serving(
        imgs, method="ctc_greedy", canvas=(32, 64), batch_size=4,
        max_length=6,
    )
    # and those ARE the EMA weights: the artifact's params differ from
    # the full checkpoint's raw params
    from flax import serialization as _ser

    art_params = _ser.msgpack_restore(
        open(os.path.join(art_dir, "params.msgpack"), "rb").read()
    )
    raw_blob = _ser.msgpack_restore(
        open(os.path.join(exp_dir, "last_ckpt.msgpack"), "rb").read()
    )
    flat_art = jax.tree_util.tree_leaves(art_params.get("params", art_params))
    flat_raw = jax.tree_util.tree_leaves(raw_blob["params"])
    assert any(
        not np.allclose(np.asarray(a, np.float32), np.asarray(r, np.float32))
        for a, r in zip(flat_art, flat_raw)
    )
    # the handoff logged its work
    log = open(os.path.join(exp_dir, "train.log"), encoding="utf-8").read()
    assert "Exported serving artifact" in log

    # a bad block fails at training START (no epoch, no exp artifacts)
    bad_dir = str(tiny_env["tmp"] / "exp_export_bad")
    with pytest.raises(ValueError, match="unknown method"):
        run_training(_base_cfg(
            tiny_env, bad_dir, export_artifact={"method": "telepathy"},
        ))
    assert not os.path.exists(os.path.join(bad_dir, "last_ckpt.msgpack"))


@pytest.mark.slow
def test_training_export_calibrated_int8_artifact(tiny_env):
    """export_artifact with quantize+calibrate ships the headline
    int8-STATIC serving path straight out of the training config: the
    artifact's manifest records the static activation-quant mode and the
    calibrated scales ride in its params."""
    from flax import serialization as _ser

    exp_dir = str(tiny_env["tmp"] / "exp_export_int8")
    cfg = _base_cfg(
        tiny_env, exp_dir, head="both", epochs=1,
        export_artifact={
            "method": "ctc_greedy", "slot": "last",
            "canvas": [32, 64], "batch_size": 4, "max_length": 6,
            "quantize": True, "calibrate": 8,
        },
    )
    result = run_training(cfg)
    art_dir = result["artifact_dir"]
    manifest = __import__("json").load(
        open(os.path.join(art_dir, "manifest.json"), encoding="utf-8")
    )
    assert manifest["quantize"] is True
    assert manifest["act_quant"] == "static"
    params = _ser.msgpack_restore(
        open(os.path.join(art_dir, "params.msgpack"), "rb").read()
    )
    assert "quant_stats" in params
    log = open(os.path.join(exp_dir, "train.log"), encoding="utf-8").read()
    assert "Calibrated static int8 scales on 8 validation images" in log


@pytest.mark.slow
def test_training_export_inherits_width_buckets(tiny_env):
    """A bucketed training run hands its auto-derived bucket widths to
    the exported artifact: one serving kernel per training width, unless
    the export block names its own set."""
    exp_dir = str(tiny_env["tmp"] / "exp_export_buckets")
    cfg = _base_cfg(
        tiny_env, exp_dir, head="both", epochs=1, width_buckets=2,
        export_artifact={
            "method": "ctc_greedy", "slot": "last",
            "canvas": [32, 64], "batch_size": 4, "max_length": 6,
        },
    )
    result = run_training(cfg)
    manifest = json.load(
        open(os.path.join(result["artifact_dir"], "manifest.json"),
             encoding="utf-8")
    )
    # the derived training buckets are logged; the artifact must carry
    # exactly that set
    log = open(os.path.join(exp_dir, "train.log"), encoding="utf-8").read()
    import re

    m = re.search(r"width_buckets=auto\(k=2\) -> \[([0-9, ]+)\]", log)
    assert m, "training did not derive buckets"
    derived = [int(v) for v in m.group(1).split(",")]
    assert manifest["widths"] == sorted(derived)
    kernels = [
        f for f in os.listdir(result["artifact_dir"])
        if f.endswith(".stablehlo")
    ]
    assert len(kernels) == len(derived)


@pytest.mark.slow
def test_resume_from_torch_checkpoint_warm_starts(tiny_env):
    """resume_path at a reference .pth (a path Config's resume resolution
    can produce) used to be SILENTLY skipped — fresh weights overwrote
    the resumed experiment.  It now warm-starts the model weights (no
    optimizer/counters — a .pth has none) and says so; an unknown
    checkpoint format is refused loudly (round-4 review)."""
    from rcnn_ocr_tpu.interop.torch_export import save_torch_checkpoint
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io

    exp_dir = str(tiny_env["tmp"] / "exp_warm_src")
    cfg = _base_cfg(tiny_env, exp_dir, epochs=1)
    run_training(cfg)

    # export the trained weights to the reference layout
    from rcnn_ocr_tpu.utils.common import load_model

    _, variables, _ = load_model(
        os.path.join(exp_dir, "last_ckpt.msgpack")
    )
    pth = str(tiny_env["tmp"] / "warm.pth")
    # strict=False: a width_mult=0.125 test model is framework-internal
    save_torch_checkpoint(pth, variables, strict=False)

    exp2 = str(tiny_env["tmp"] / "exp_warm_dst")
    cfg2 = _base_cfg(tiny_env, exp2, epochs=1, resume_path=pth)
    result = run_training(cfg2)
    assert np.isfinite(result["val_loss"])
    # Config's resume overlay may redirect exp_dir next to the checkpoint
    log = open(
        os.path.join(result["exp_dir"], "train.log"), encoding="utf-8"
    ).read()
    assert "Warm start from torch checkpoint" in log

    # unknown format: loud refusal, not a silent fresh start
    bogus = tiny_env["tmp"] / "ckpt.foo"
    bogus.write_bytes(b"junk")
    with pytest.raises(ValueError, match="unsupported checkpoint format"):
        run_training(_base_cfg(
            tiny_env, str(tiny_env["tmp"] / "exp_warm_bad"),
            epochs=1, resume_path=str(bogus),
        ))
