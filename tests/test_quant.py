"""int8 quantized inference: op correctness + model-level closeness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcnn_ocr_tpu.ops.quant import (
    int8_conv_nhwc,
    quantize_activation,
    quantize_weight_per_cout,
)


def test_weight_quant_roundtrip(rng):
    w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
    wq, s = quantize_weight_per_cout(jnp.asarray(w))
    assert wq.dtype == jnp.int8
    assert s.shape == (16,)
    back = np.asarray(wq).astype(np.float32) * np.asarray(s)
    # per-channel max error bounded by half a quantization step
    err = np.abs(back - w).max(axis=(0, 1, 2))
    step = np.asarray(s)
    assert (err <= step / 2 + 1e-6).all()


def test_activation_quant_symmetric(rng):
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    xq, s = quantize_activation(jnp.asarray(x))
    assert xq.dtype == jnp.int8
    assert int(np.abs(np.asarray(xq)).max()) <= 127
    back = np.asarray(xq).astype(np.float32) * float(s)
    assert np.abs(back - x).max() <= float(s) / 2 + 1e-6


def test_int8_conv_close_to_float(rng):
    x = rng.normal(size=(2, 8, 16, 32)).astype(np.float32)
    w = (rng.normal(size=(3, 3, 32, 64)) * 0.1).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = int8_conv_nhwc(jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)))
    ref, got = np.asarray(ref), np.asarray(got)
    # relative error of int8 conv vs f32 stays small on well-scaled data
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.02


def test_quantized_model_close_and_param_compatible(rng):
    """quantize=True reuses the exact same params and produces encoder
    outputs close to the float model (greedy decode usually identical)."""
    from rcnn_ocr_tpu.models import RCNN

    common = dict(num_classes=10, hidden_size=16, width_mult=0.25, lstm_layers=1)
    m = RCNN(**common)
    mq = RCNN(**common, quantize=True)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 3)).astype(np.float32))
    v = m.init({"params": key}, x, train=False, batch_max_length=4)
    a = np.asarray(m.apply(v, x, train=False, method=m.encode))
    b = np.asarray(mq.apply(v, x, train=False, method=mq.encode))
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.2  # random init amplifies quant noise; trained nets are tighter
    # training mode must NOT take the int8 path (gradients need float convs)
    logits, _ = mq.apply(
        v, x, text=jnp.ones((2, 5), jnp.int32), train=True, batch_max_length=4,
        rngs={"dropout": key}, mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(logits)).all()
