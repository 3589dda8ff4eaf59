"""On-device training augmentation (batched, jit-compatible).

TPU-native replacement for the reference's per-image albumentations
pipeline (`/root/reference/data/transforms.py:160-182`): the host only
resize-pads raw pixels; shift-scale-rotate, brightness/contrast, invert and
normalization run fused on the device over the WHOLE batch.  Gather-based
bilinear warp — no scatter, static shapes, vectorized over B·H·W, so XLA
fuses it with the normalize and the stem conv's input pipeline.

Semantics match the host path (`rcnn_ocr_tpu.data.transforms`):

* angle ~ U(-rot, rot) degrees about the pixel center, isotropic scale
  1 + U(-s, s), translation U(-sh, sh) * (W, H), constant white fill —
  the cv2.getRotationMatrix2D / warpAffine convention;
* brightness/contrast: ``x*alpha + beta + 0.5*(1-alpha)`` on the [0, 1]
  scale (contrast pivots about mid-gray);
* every image in the batch draws its own parameters and its own
  apply/skip coins, exactly like per-sample host augmentation.

Images are float32 in [0, 1] throughout; :func:`device_train_augment`
takes uint8 (cheap host->device transfer) and returns the normalized
[-1, 1] batch the model consumes.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def inverse_affine_matrices(
    angles_deg: jnp.ndarray,  # [B]
    scales: jnp.ndarray,  # [B]
    dx: jnp.ndarray,  # [B] pixels
    dy: jnp.ndarray,  # [B] pixels
    height: int,
    width: int,
) -> jnp.ndarray:
    """Per-image inverse (output->input) 2x3 affine matrices.

    Forward map is cv2.getRotationMatrix2D((W/2-0.5, H/2-0.5), angle, scale)
    with the translation added — inverted analytically so the warp can
    gather source pixels.
    """
    theta = angles_deg * (math.pi / 180.0)
    alpha = scales * jnp.cos(theta)
    beta = scales * jnp.sin(theta)
    cx = width / 2.0 - 0.5
    cy = height / 2.0 - 0.5
    tx = (1.0 - alpha) * cx - beta * cy + dx
    ty = beta * cx + (1.0 - alpha) * cy + dy

    det = jnp.maximum(alpha * alpha + beta * beta, 1e-12)
    ia = alpha / det
    ib = beta / det
    itx = -(ia * tx - ib * ty)
    ity = -(ib * tx + ia * ty)
    row0 = jnp.stack([ia, -ib, itx], axis=-1)
    row1 = jnp.stack([ib, ia, ity], axis=-1)
    return jnp.stack([row0, row1], axis=1)  # [B, 2, 3]


def affine_warp(
    images: jnp.ndarray,  # [B, H, W, C] float in [0, 1]
    inv_mats: jnp.ndarray,  # [B, 2, 3] output->input maps
    fill: float = 1.0,
) -> jnp.ndarray:
    """Batched bilinear warp with constant fill outside the source."""
    b, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]
    coords = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [H, W, 3]
    src = jnp.einsum("bij,hwj->bhwi", inv_mats, coords)  # [B, H, W, 2]
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]

    flat = images.reshape(b, h * w, c)

    def tap(yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(b, h * w)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(b, h, w, c)
        return jnp.where(inside[..., None], vals, fill)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def shift_scale_rotate_batch(
    images: jnp.ndarray,  # [B, H, W, C] float in [0, 1]
    key: jax.Array,
    p: float = 0.3,
    shift_limit: float = 0.03,
    scale_limit: float = 0.08,
    rotate_limit: float = 3.0,
    fill: float = 1.0,
) -> jnp.ndarray:
    """Per-image random affine; each image flips its own apply coin."""
    b, h, w, _ = images.shape
    k_coin, k_ang, k_sc, k_dx, k_dy = jax.random.split(key, 5)
    apply = jax.random.uniform(k_coin, (b,)) < p
    angles = jax.random.uniform(k_ang, (b,), minval=-rotate_limit, maxval=rotate_limit)
    scales = 1.0 + jax.random.uniform(k_sc, (b,), minval=-scale_limit, maxval=scale_limit)
    dx = jax.random.uniform(k_dx, (b,), minval=-shift_limit, maxval=shift_limit) * w
    dy = jax.random.uniform(k_dy, (b,), minval=-shift_limit, maxval=shift_limit) * h

    # skipped images get the identity map (warp is then a no-op gather)
    angles = jnp.where(apply, angles, 0.0)
    scales = jnp.where(apply, scales, 1.0)
    dx = jnp.where(apply, dx, 0.0)
    dy = jnp.where(apply, dy, 0.0)
    mats = inverse_affine_matrices(angles, scales, dx, dy, h, w)
    return affine_warp(images, mats, fill=fill)


def brightness_contrast_batch(
    images: jnp.ndarray,  # [B, H, W, C] float in [0, 1]
    key: jax.Array,
    p: float = 0.3,
    brightness_limit: float = 0.2,
    contrast_limit: float = 0.2,
) -> jnp.ndarray:
    """Contrast about mid-gray + brightness shift, per image, on [0, 1]."""
    b = images.shape[0]
    k_coin, k_a, k_b = jax.random.split(key, 3)
    apply = jax.random.uniform(k_coin, (b,)) < p
    alpha = 1.0 + jax.random.uniform(k_a, (b,), minval=-contrast_limit, maxval=contrast_limit)
    beta = jax.random.uniform(k_b, (b,), minval=-brightness_limit, maxval=brightness_limit)
    alpha = jnp.where(apply, alpha, 1.0)[:, None, None, None]
    beta = jnp.where(apply, beta, 0.0)[:, None, None, None]
    out = images * alpha + beta + 0.5 * (1.0 - alpha)
    return jnp.clip(out, 0.0, 1.0)


def invert_batch(images: jnp.ndarray, key: jax.Array, p: float = 0.0) -> jnp.ndarray:
    b = images.shape[0]
    apply = jax.random.uniform(key, (b,)) < p
    return jnp.where(apply[:, None, None, None], 1.0 - images, images)


# all 256 possible normalized uint8 values, computed with host IEEE fp32
# arithmetic — the device applies them by lookup, so the on-device result
# is bit-identical to the host formula on EVERY backend.  (TPU's fp32
# divide is reciprocal-based: `(x/255-.5)/.5` computed on-chip differs
# from IEEE on 111/256 inputs, and input 127 — which normalizes to -1/255,
# astride a bf16 rounding boundary — lands on a DIFFERENT bf16, flipping
# decodes between uint8- and float32-fed batches.  Measured by
# tools/normalize_exactness_probe.py.)
_U8_NORM_TABLE = (
    (np.arange(256, dtype=np.float32) / np.float32(255.0)) - np.float32(0.5)
) / np.float32(0.5)


def device_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC batch -> normalized [-1, 1] float32, on device.

    The no-augmentation mirror of
    :func:`rcnn_ocr_tpu.data.transforms.normalize_unit` — a 256-entry
    exact lookup, so device- and host-normalized batches are bit-identical
    on every backend (see ``_U8_NORM_TABLE``).  Ships resize-padded uint8
    across the host->device link (4x fewer bytes than normalized float32);
    float inputs pass through unchanged so callers stay compatible with
    host-normalized batches.
    """
    if images.dtype == jnp.uint8:
        return jnp.asarray(_U8_NORM_TABLE)[images.astype(jnp.int32)]
    return images


def device_train_augment(
    images_u8: jnp.ndarray,  # [B, H, W, C] uint8 (resize-padded on host)
    key: jax.Array,
    params: Optional[Dict] = None,
) -> jnp.ndarray:
    """Full device-side train pipeline: affine -> B/C -> invert -> normalize.

    Parameter names and defaults are the config keys the host pipeline uses
    (`rcnn_ocr_tpu.data.transforms.get_train_transform`); output is the
    normalized [-1, 1] float32 batch.
    """
    p = params or {}
    x = images_u8.astype(jnp.float32) / 255.0
    k_ssr, k_bc, k_inv = jax.random.split(key, 3)
    x = shift_scale_rotate_batch(
        x, k_ssr,
        # coercions mirror the HOST pipeline exactly (transforms.py:
        # round(.., 4) on the float limits, int() on rotate — itself
        # reference parity), so device_augment trains the same
        # distribution as the host path for any config value
        p=round(float(p.get("p_ShiftScaleRotate", 0.3)), 4),
        shift_limit=round(float(p.get("shift_limit", 0.03)), 4),
        scale_limit=round(float(p.get("scale_limit", 0.08)), 4),
        rotate_limit=int(p.get("rotate_limit", 3)),
    )
    x = brightness_contrast_batch(
        x, k_bc,
        p=round(float(p.get("p_BrightnessContrast", 0.3)), 4),
        brightness_limit=round(float(p.get("brightness_limit", 0.2)), 4),
        contrast_limit=round(float(p.get("contrast_limit", 0.2)), 4),
    )
    x = invert_batch(x, k_inv, p=round(float(p.get("invert_p", 0.0)), 4))
    return (x - 0.5) / 0.5
