"""int8 quantized inference ops.

The v5e MXU runs int8 x int8 -> int32 at ~1.5x the bf16 rate on this
model's hot conv shapes (measured: 203 TOP/s vs 137 TFLOP/s — PERF.md).
This module provides post-training quantization for the wide convolutions:

* weights: symmetric per-output-channel int8 (no calibration needed);
* activations: symmetric per-tensor *dynamic* int8 — the abs-max reduce
  costs one extra HBM read of a tensor that was just written (~0.2 ms per
  conv at bs2048), no calibration dataset required;
* accumulation in int32, dequantized with the fused scale
  ``x_scale * w_scale[c]`` into float.

Only layers that are MXU-bound benefit (the 256/512-channel stages);
the stem stays in bf16.  Training always runs bf16 — this is an
inference-serving path, enabled via ``RCNN(quantize=True)`` /
``OCRInference(..., quantize=True)``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def quantize_weight_per_cout(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO conv kernel -> (int8 kernel, per-output-channel float scale)."""
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-8)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tensor -> (int8 tensor, scalar float scale), symmetric dynamic."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    s = jnp.maximum(s, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return xq, s


def int8_conv_nhwc(
    x: jnp.ndarray,  # [B, H, W, Cin] float
    w: jnp.ndarray,  # [kh, kw, Cin, Cout] float
    strides: Sequence[int],
    padding,
) -> jnp.ndarray:
    """Quantize-on-the-fly int8 convolution, float output.

    Weight quantization is constant-foldable under jit (it only depends on
    params); activation quantization is dynamic per call.
    """
    wq, ws = quantize_weight_per_cout(w)
    xq, xs = quantize_activation(x)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (xs * ws)


def int8_conv_nhwc_static(
    x: jnp.ndarray,  # [B, H, W, Cin] float
    w: jnp.ndarray,  # [kh, kw, Cin, Cout] float
    strides: Sequence[int],
    padding,
    act_scale: jnp.ndarray,  # scalar float: calibrated abs-max / 127
) -> jnp.ndarray:
    """int8 convolution with a CALIBRATED static activation scale.

    Unlike the dynamic path, there is no abs-max reduction over the input —
    the quantize-to-int8 step is purely elementwise, so XLA fuses it into
    the *producer's* epilogue (the previous conv's dequant-BN-ReLU chain)
    and the activation crosses HBM once, as int8, instead of fp + two extra
    passes.  Scales come from a calibration pass over sample data
    (``OCRInference.calibrate``); values beyond the calibrated range clip.
    """
    act_scale = jnp.maximum(act_scale, 1e-8)
    wq, ws = quantize_weight_per_cout(w)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (act_scale * ws)
