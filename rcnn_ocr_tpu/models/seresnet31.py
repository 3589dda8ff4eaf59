"""SE-ResNet31 backbone in Flax (NHWC, XLA convolutions).

Architecture contract (verified against `/root/reference/model/seresnet31.py`):

* stem: conv3x3(3->64)-BN-ReLU, conv3x3(64->128)-BN-ReLU, maxpool2  -> H/2, W/2
* layer1: 1x SEBasicBlock 128->256, stride 2                         -> H/4, W/4
* layer2: 2x SEBasicBlock 256
* layer3: 5x SEBasicBlock 256->512, stride 2                         -> H/8, W/8
* layer4: 3x SEBasicBlock 512
* out head: conv2x2 stride(2,1) pad(0,1) -> BN-ReLU,
            conv2x2 stride 1 pad 0 -> BN-ReLU                         -> H/32ish, W/8

Net time-axis downsampling is x8 (the reference's ``W/4`` comment at
`seresnet31.py:187` is wrong — three stride-2 stages touch W).

TPU-first design choices: NHWC layout (XLA TPU native), channels padded to
MXU-friendly multiples already by construction (64/128/256/512), compute in
``dtype`` (bf16 by default) with fp32 parameters and fp32 batch-norm
statistics.  The squeeze-excite block optionally runs as a fused Pallas
kernel (`rcnn_ocr_tpu.ops.se_pallas`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rcnn_ocr_tpu.models.dropblock import dropblock_2d

Dtype = Any


class SELayer(nn.Module):
    """Squeeze-and-excite: global avg-pool -> FC(C/r) -> ReLU -> FC(C) -> sigmoid -> scale.

    Reference: `/root/reference/model/seresnet31.py:5-20` (both FCs bias-free).
    """

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = max(1, self.channels // self.reduction)
        w1 = self.param(
            "fc1",
            nn.initializers.lecun_normal(),
            (self.channels, squeeze),
            jnp.float32,
        )
        w2 = self.param(
            "fc2",
            nn.initializers.lecun_normal(),
            (squeeze, self.channels),
            jnp.float32,
        )
        if self.use_pallas:
            from rcnn_ocr_tpu.ops.se_pallas import se_scale

            return se_scale(x, w1.astype(self.dtype), w2.astype(self.dtype))
        # XLA path: pool in fp32 for exactness, excite in compute dtype
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # [B, C]
        y = y.astype(self.dtype)
        y = nn.relu(y @ w1.astype(self.dtype))
        y = nn.sigmoid(y @ w2.astype(self.dtype))
        return x * y[:, None, None, :].astype(x.dtype)


class _RawConv(nn.Module):
    """Bias-free conv with direct kernel access (enables the int8 path).

    Param layout matches ``nn.Conv`` (``<name>/kernel`` HWIO) so
    checkpoints and the torch importer are unaffected.
    """

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Any
    dtype: Dtype
    quantize: bool = False
    # activation quantization mode for the int8 path: "dynamic" computes a
    # per-call abs-max; "static" uses a calibrated scale from the
    # `quant_stats` collection (recorded when that collection is mutable —
    # the calibration pass — and the forward stays full-precision there).
    act_quant: str = "dynamic"
    # space-to-depth rewrite of a 3x3/s1/p1 conv (exact; MXU-friendlier for
    # tiny input-channel counts — the stem's C=3 first conv).  Inference
    # only; the [3,3,C,F] parameter is untouched (`ops/stem.py`).
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        padding = self.padding
        if self.quantize and not train:
            from rcnn_ocr_tpu.ops.quant import int8_conv_nhwc, int8_conv_nhwc_static

            if self.act_quant == "static":
                stat = self.variable(
                    "quant_stats",
                    "act_absmax",
                    lambda: jnp.zeros((), jnp.float32),
                )
                if self.is_mutable_collection("quant_stats"):
                    # calibration pass: record the range, run full precision
                    stat.value = jnp.maximum(
                        stat.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                    )
                else:
                    return int8_conv_nhwc_static(
                        x, k, self.strides, padding, stat.value / 127.0
                    ).astype(self.dtype)
            else:
                return int8_conv_nhwc(x, k, self.strides, padding).astype(self.dtype)
        if (
            self.s2d
            and not train
            and self.kernel == (3, 3)
            and tuple(self.strides) == (1, 1)
            and tuple(map(tuple, padding)) == ((1, 1), (1, 1))
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            from rcnn_ocr_tpu.ops.stem import (
                depth_to_space,
                s2d_kernel,
                space_to_depth_pad1,
            )

            xs = space_to_depth_pad1(x.astype(self.dtype))
            ys = jax.lax.conv_general_dilated(
                xs,
                s2d_kernel(k).astype(self.dtype),
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return depth_to_space(ys)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k.astype(self.dtype),
            window_strides=tuple(self.strides),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ConvBN(nn.Module):
    """conv -> batch-norm helper.  BN statistics/scale kept in fp32."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    # explicit symmetric padding — torch's `padding=1` semantics; flax
    # "SAME" pads asymmetrically under stride 2 and would shift the grid
    padding: Any = ((1, 1), (1, 1))
    dtype: Dtype = jnp.float32
    quantize: bool = False  # int8 inference path for MXU-bound layers
    act_quant: str = "dynamic"  # activation quant mode (see _RawConv)
    s2d: bool = False  # space-to-depth conv rewrite (see _RawConv)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = _RawConv(
            self.features,
            self.kernel,
            self.strides,
            self.padding,
            self.dtype,
            quantize=self.quantize,
            act_quant=self.act_quant,
            s2d=self.s2d,
            name="conv",
        )(x, train)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))
        return x.astype(self.dtype)


class SEBasicBlock(nn.Module):
    """conv3x3-BN-ReLU -> conv3x3-BN -> SE -> (DropBlock) -> +identity -> ReLU.

    Reference: `/root/reference/model/seresnet31.py:23-67`.  The 1x1-conv-BN
    downsample branch appears whenever stride != 1 or the width changes.
    """

    features: int
    stride: int = 1
    reduction: int = 16
    dropblock_p: float = 0.0
    dropblock_block_size: int = 5
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    quantize: bool = False
    act_quant: str = "dynamic"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_features = x.shape[-1]
        identity = x
        out = ConvBN(
            self.features, strides=(self.stride, self.stride), dtype=self.dtype,
            quantize=self.quantize, act_quant=self.act_quant, name="conv1"
        )(x, train)
        out = nn.relu(out)
        out = ConvBN(
            self.features, dtype=self.dtype, quantize=self.quantize,
            act_quant=self.act_quant, name="conv2"
        )(out, train)
        out = SELayer(
            self.features,
            self.reduction,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="se",
        )(out)
        if self.dropblock_p > 0.0 and train:
            out = dropblock_2d(
                self.make_rng("dropout"),
                out,
                self.dropblock_p,
                self.dropblock_block_size,
                train,
            )
        if self.stride != 1 or in_features != self.features:
            # DELIBERATELY not int8-quantized: the 1x1 stride-2 projection
            # is a tiny fraction of a block's FLOPs (one per stage
            # transition), so int8 buys ~nothing while adding a
            # quantize/dequantize round-trip and extra calibration state —
            # and the shipped int8 path already audits at conv
            # speed-of-light (PERF.md per-stage audit)
            identity = ConvBN(
                self.features,
                kernel=(1, 1),
                strides=(self.stride, self.stride),
                padding="VALID",
                dtype=self.dtype,
                name="downsample",
            )(x, train)
        return nn.relu(out + identity)


class SEResNet31(nn.Module):
    """The full backbone.  Input NHWC, output NHWC feature map [B, H', W/8, 512]."""

    out_channels: int = 512
    reduction: int = 16
    dropblock_p: float = 0.0
    dropblock_block_size: int = 5
    width_mult: float = 1.0  # scales every stage width (HPO / tiny-test knob)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    quantize: bool = False  # int8 inference for the MXU-bound wide stages
    act_quant: str = "dynamic"  # "static" after OCRInference.calibrate()
    # also int8-quantize the stem convs.  With DYNAMIC activation scales
    # this measured slower (the abs-max pass over the large early
    # activations costs more than the int8 conv saves — PERF.md negative
    # results); the STATIC path has no abs-max pass, so the stem becomes
    # a candidate again (tools/quant_experiments.py re-measures it).
    quantize_stem: bool = False
    # exact space-to-depth rewrite of the C=3 stem conv (ops/stem.py).
    # Measured SLOWER on v5e at 32x128 (tools/stem_experiments.py: 16.9 ms vs
    # 13.6 ms per 2048 — the s2d/d2s transposes cost more than the padded
    # C=3 contraction wastes; the fused stem already runs at ~roofline).
    # Kept as an option for other shapes/generations.
    stem_s2d: bool = False

    def _w(self, c: int) -> int:
        return max(8, int(round(c * self.width_mult)))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        # stem
        q_stem = self.quantize and self.quantize_stem
        if q_stem and self.stem_s2d:
            # the int8 conv branch returns before the s2d rewrite is ever
            # considered — accepting the combination would silently run
            # the plain int8 conv and mislabel any s2d measurement
            # (the silently-dropped-knob rule)
            raise ValueError(
                "stem_s2d composes with the fp/bf16 stem only; the int8 "
                "stem (quantize_stem) bypasses the space-to-depth rewrite "
                "— pick one"
            )
        x = nn.relu(
            ConvBN(
                self._w(64), dtype=self.dtype, s2d=self.stem_s2d,
                quantize=q_stem, act_quant=self.act_quant, name="stem0"
            )(x, train)
        )
        x = nn.relu(
            ConvBN(
                self._w(128), dtype=self.dtype,
                quantize=q_stem, act_quant=self.act_quant, name="stem1"
            )(x, train)
        )
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

        block_kwargs = dict(
            reduction=self.reduction,
            quantize=self.quantize,
            act_quant=self.act_quant,
            dropblock_p=self.dropblock_p,
            dropblock_block_size=self.dropblock_block_size,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
        )
        stages = [
            (self._w(256), 1, 2),  # layer1: features, blocks, first-stride
            (self._w(256), 2, 1),  # layer2
            (self._w(512), 5, 2),  # layer3
            (self._w(512), 3, 1),  # layer4
        ]
        for li, (features, blocks, stride) in enumerate(stages, start=1):
            for bi in range(blocks):
                x = SEBasicBlock(
                    features,
                    stride=stride if bi == 0 else 1,
                    name=f"layer{li}_block{bi}",
                    **block_kwargs,
                )(x, train)

        # out head: conv2x2 s(2,1) p(0,1), conv2x2 s1 p0 (torch pad semantics)
        out_ch = self._w(self.out_channels)
        x = nn.relu(
            ConvBN(
                out_ch,
                kernel=(2, 2),
                strides=(2, 1),
                padding=((0, 0), (1, 1)),
                dtype=self.dtype,
                quantize=self.quantize,
                act_quant=self.act_quant,
                name="out0",
            )(x, train)
        )
        x = nn.relu(
            ConvBN(
                out_ch,
                kernel=(2, 2),
                strides=(1, 1),
                padding="VALID",
                dtype=self.dtype,
                quantize=self.quantize,
                act_quant=self.act_quant,
                name="out1",
            )(x, train)
        )
        return x
