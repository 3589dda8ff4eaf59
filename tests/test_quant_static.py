"""Static-activation int8 path: op equivalence, calibration, inference API."""

import jax
import jax.numpy as jnp
import numpy as np

from rcnn_ocr_tpu.ops.quant import (
    int8_conv_nhwc,
    int8_conv_nhwc_static,
)


def test_static_matches_dynamic_at_true_scale(rng):
    """With act_scale == abs-max/127 the static conv is bit-identical to
    the dynamic one (same quantized operands)."""
    x = rng.normal(size=(2, 8, 16, 32)).astype(np.float32)
    w = (rng.normal(size=(3, 3, 32, 64)) * 0.1).astype(np.float32)
    scale = jnp.asarray(np.abs(x).max() / 127.0, jnp.float32)
    dyn = int8_conv_nhwc(jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)))
    sta = int8_conv_nhwc_static(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)), scale
    )
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(sta))


def test_static_clips_out_of_range(rng):
    """Inputs beyond the calibrated range saturate at ±127·scale instead of
    blowing up the scale for the whole tensor."""
    x = np.zeros((1, 4, 4, 8), np.float32)
    x[0, 0, 0, 0] = 100.0  # outlier far past the calibrated range
    w = np.zeros((1, 1, 8, 4), np.float32)
    w[0, 0, 0, 0] = 1.0
    out = int8_conv_nhwc_static(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        jnp.asarray(1.0 / 127.0, jnp.float32),  # calibrated for |x| <= 1
    )
    assert float(np.asarray(out)[0, 0, 0, 0]) == 1.0  # clipped, not 100


def test_backbone_calibration_records_and_applies(rng):
    """Calibration (mutable quant_stats) records per-conv abs-max; the
    static apply then stays close to the dynamic int8 output."""
    from rcnn_ocr_tpu.models.seresnet31 import SEResNet31

    kwargs = dict(width_mult=0.25, dtype=jnp.float32, quantize=True)
    dyn = SEResNet31(**kwargs)
    sta = SEResNet31(**kwargs, act_quant="static")
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 3)).astype(np.float32))
    v = dyn.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    # calibration pass: full-precision forward, stats recorded
    _, mutated = sta.apply(v, x, train=False, mutable=["quant_stats"])
    stats = mutated["quant_stats"]
    leaves = jax.tree_util.tree_leaves(stats)
    assert leaves and all(float(l) > 0 for l in leaves)

    v_cal = {**v, "quant_stats": stats}
    got = np.asarray(sta.apply(v_cal, x, train=False))
    want = np.asarray(dyn.apply(v, x, train=False))
    # calibration observes FULL-PRECISION activations while the dynamic
    # path's abs-max sees int8-propagated ones, so scales differ by O(quant
    # noise) — outputs agree to quantization-noise tolerance, not exactly
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < 0.05, rel


def test_quantize_stem_wiring(rng):
    """quantize_stem=True int8-quantizes stem0/stem1 too: their quant_stats
    entries appear under calibration and the output stays close to bf16."""
    from rcnn_ocr_tpu.models.seresnet31 import SEResNet31

    kwargs = dict(width_mult=0.25, dtype=jnp.float32, quantize=True)
    base = SEResNet31(**kwargs, act_quant="static")
    stem = SEResNet31(**kwargs, act_quant="static", quantize_stem=True)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 3)).astype(np.float32))
    v = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    _, mut_base = base.apply(v, x, train=False, mutable=["quant_stats"])
    _, mut_stem = stem.apply(v, x, train=False, mutable=["quant_stats"])
    base_keys = set(mut_base["quant_stats"]["cnn"] if "cnn" in mut_base["quant_stats"] else mut_base["quant_stats"])
    stem_keys = set(mut_stem["quant_stats"]["cnn"] if "cnn" in mut_stem["quant_stats"] else mut_stem["quant_stats"])
    assert {"stem0", "stem1"} <= stem_keys
    assert not ({"stem0", "stem1"} & base_keys)

    v_cal = {**v, "quant_stats": mut_stem["quant_stats"]}
    got = np.asarray(stem.apply(v_cal, x, train=False))
    want = np.asarray(SEResNet31(width_mult=0.25, dtype=jnp.float32).apply(v, x, train=False))
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < 0.08, rel


def test_inference_calibrate_api(tmp_path, rng):
    """OCRInference(quantize=True).calibrate(): decodes still work and the
    static path is active (quant_stats present, model act_quant static)."""
    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state
    from rcnn_ocr_tpu.vocab.charset import Charset

    tokens = ["<PAD>", "<SOS>", "<EOS>", " "] + list("abc")
    charset = Charset.from_tokens(tokens)
    model = RCNN(
        num_classes=charset.num_classes, hidden_size=16, width_mult=0.25,
        lstm_layers=1, with_ctc_head=True, ctc_blank_id=charset.ctc_blank_id,
        sos_id=charset.sos_id, eos_id=charset.eos_id, pad_id=charset.pad_id,
        dtype=jnp.float32,
    )
    x0 = jnp.zeros((1, 32, 64, 3), jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0)}, x0,
        text=jnp.zeros((1, 5), jnp.int32), batch_max_length=4,
        method=model.init_all,
    )
    state = create_train_state(model, v, build_optimizer("Adam", 1e-3))
    ckpt = tmp_path / "ckpt.msgpack"
    ckpt_io.save_checkpoint(
        str(ckpt), state, None, epoch=1, global_step=1, best_val_loss=0.0,
        best_val_acc=0.0, itos=list(charset.itos), stoi=dict(charset.stoi),
        config={"img_h": 32, "img_w": 64, "hidden_size": 16}, log_dir="logs",
    )

    ocr = OCRInference(str(ckpt), quantize=True, dtype=jnp.float32, verbose=False)
    imgs = [
        (rng.uniform(0, 255, size=(32, 64, 3))).astype(np.uint8) for _ in range(4)
    ]
    before = ocr.predict(imgs, max_length=4, batch_size=4)
    ocr.calibrate(imgs, batch_size=4)
    assert ocr.model.act_quant == "static"
    assert "quant_stats" in ocr.variables
    after = ocr.predict(imgs, max_length=4, batch_size=4)
    assert isinstance(after, list) and len(after) == 4
    # calibrated on the same inputs -> decisions should agree with dynamic
    assert before == after

    # persistence round-trip: the saved checkpoint re-opens directly on the
    # static path (no re-calibration) and decodes identically
    cal_path = str(tmp_path / "calibrated.msgpack")
    ocr.save_calibration(cal_path)
    ocr2 = OCRInference(cal_path, quantize=True, dtype=jnp.float32, verbose=False)
    assert ocr2.model.act_quant == "static"
    assert "quant_stats" in ocr2.variables
    assert ocr2.predict(imgs, max_length=4, batch_size=4) == after
    # uncalibrated error path
    ocr3 = OCRInference(str(ckpt), quantize=True, dtype=jnp.float32, verbose=False)
    try:
        ocr3.save_calibration(str(tmp_path / "x.msgpack"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
