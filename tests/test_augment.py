"""On-device augmentation (ops/augment.py) vs the host cv2 path.

The device pipeline must match the host transforms' semantics
(`rcnn_ocr_tpu/data/transforms.py`): same affine convention
(cv2.getRotationMatrix2D about the pixel center, white fill), same
brightness/contrast formula, same parameter ranges.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcnn_ocr_tpu.ops.augment import (
    affine_warp,
    brightness_contrast_batch,
    device_train_augment,
    inverse_affine_matrices,
    shift_scale_rotate_batch,
)


def _cv2_warp(img_u8: np.ndarray, angle: float, scale: float, dx: float, dy: float):
    h, w = img_u8.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, scale)
    m[0, 2] += dx
    m[1, 2] += dy
    return cv2.warpAffine(
        img_u8, m, (w, h), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=(255, 255, 255),
    )


@pytest.mark.parametrize(
    "angle,scale,dx,dy",
    [(0.0, 1.0, 0.0, 0.0), (3.0, 1.05, 2.0, -1.5), (-2.5, 0.93, -3.0, 1.0)],
)
def test_affine_warp_matches_cv2(angle, scale, dx, dy):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(32, 96, 3), dtype=np.uint8)
    want = _cv2_warp(img, angle, scale, dx, dy).astype(np.float32) / 255.0

    x = jnp.asarray(img[None].astype(np.float32) / 255.0)
    mats = inverse_affine_matrices(
        jnp.array([angle]), jnp.array([scale]), jnp.array([dx]), jnp.array([dy]),
        32, 96,
    )
    got = np.asarray(affine_warp(x, mats, fill=1.0))[0]
    # bilinear resampling differences (cv2 fixed-point vs float) stay tiny
    assert np.abs(got - want).mean() < 0.004
    assert np.abs(got - want).max() < 0.06


def test_identity_warp_is_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(2, 16, 24, 3)).astype(np.float32))
    mats = inverse_affine_matrices(
        jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.zeros(2), 16, 24
    )
    np.testing.assert_allclose(np.asarray(affine_warp(x, mats)), np.asarray(x), atol=1e-6)


def test_brightness_contrast_matches_host_formula():
    from rcnn_ocr_tpu.data.transforms import random_brightness_contrast

    # drive both paths with the SAME alpha/beta by pinning the ranges
    class FixedRng:
        def __init__(self, alpha, beta):
            self._vals = [alpha - 1.0, beta]  # host draws contrast then brightness

        def uniform(self, lo, hi):
            return self._vals.pop(0)

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(20, 30, 3), dtype=np.uint8)
    alpha, beta = 1.13, -0.07
    want = random_brightness_contrast(
        img, FixedRng(alpha, beta), brightness_limit=1.0, contrast_limit=1.0
    ).astype(np.float32) / 255.0

    x = jnp.asarray(img[None].astype(np.float32) / 255.0)
    a = jnp.full((1, 1, 1, 1), alpha)
    b = jnp.full((1, 1, 1, 1), beta)
    got = np.asarray(jnp.clip(x * a + b + 0.5 * (1 - a), 0, 1))[0]
    # host computes on 0..255 then casts to uint8 (quantization ±1/255)
    assert np.abs(got - want).max() <= (1.0 / 255.0) + 1e-6


def test_shift_scale_rotate_batch_p0_is_identity():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(4, 16, 32, 3)).astype(np.float32))
    out = shift_scale_rotate_batch(x, jax.random.PRNGKey(0), p=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_brightness_batch_p0_identity_and_p1_applies():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(4, 8, 8, 3)).astype(np.float32))
    same = brightness_contrast_batch(x, jax.random.PRNGKey(1), p=0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x), atol=1e-6)
    changed = brightness_contrast_batch(x, jax.random.PRNGKey(1), p=1.0)
    assert np.abs(np.asarray(changed) - np.asarray(x)).max() > 1e-3


def test_device_train_augment_pipeline_normalizes():
    rng = np.random.default_rng(5)
    u8 = jnp.asarray(rng.integers(0, 255, size=(3, 16, 32, 3), dtype=np.uint8))
    # all probabilities zero -> exact normalize of the input
    params = {"p_ShiftScaleRotate": 0.0, "p_BrightnessContrast": 0.0, "invert_p": 0.0}
    out = np.asarray(device_train_augment(u8, jax.random.PRNGKey(2), params))
    want = (np.asarray(u8).astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, want, atol=1e-6)
    # full-on pipeline stays in [-1, 1] and is jittable
    params = {"p_ShiftScaleRotate": 1.0, "p_BrightnessContrast": 1.0, "invert_p": 1.0}
    # jit with params as a static closure (how the train step uses it)
    out = np.asarray(
        jax.jit(lambda im, k: device_train_augment(im, k, params))(
            u8, jax.random.PRNGKey(3)
        )
    )
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_per_image_independence():
    """Each image draws its own params: identical inputs diverge."""
    x = jnp.ones((6, 16, 32, 3), jnp.float32) * 0.5
    out = np.asarray(
        shift_scale_rotate_batch(x, jax.random.PRNGKey(4), p=1.0, rotate_limit=30.0)
    )
    flat = out.reshape(6, -1)
    assert len({tuple(np.round(r, 5)) for r in flat}) > 1
