"""Minimal ``albumentations`` API stub for running the REFERENCE trainer here.

The reference training stack (`/root/reference/training/train.py` via
`/root/reference/data/transforms.py:1-9`) depends on ``albumentations``,
which is not installed in this image.  This stub provides exactly the API
surface that file uses — ``ImageOnlyTransform``, ``Compose``,
``ShiftScaleRotate``, ``RandomBrightnessContrast``, ``InvertImg``,
``Normalize`` and ``albumentations.pytorch.ToTensorV2`` — implemented on
top of this framework's first-party augmentation ops
(`rcnn_ocr_tpu/data/transforms.py:263-311`).

That choice is deliberate: the head-to-head training certification
(`tools/train_headtohead.py`) must feed BOTH stacks the *same augmentation
distribution* so that any accuracy delta is attributable to the trainers
(loss/optimizer/schedule/precision), not to augmentation differences.  By
construction, the torch-reference run and the JAX run draw their affine /
brightness-contrast / invert ops from the same code.

Usage (before any reference import)::

    import tools.albumentations_stub as stub
    stub.install()          # registers sys.modules['albumentations']

Only the subset used by the reference is implemented; anything else raises
AttributeError, loudly.
"""

from __future__ import annotations

import sys
import types

import numpy as np

from rcnn_ocr_tpu.data.transforms import (
    invert_img,
    random_brightness_contrast,
    shift_scale_rotate,
)


class _Transform:
    """Base: applies with probability ``p`` (albumentations semantics)."""

    def __init__(self, always_apply: bool = False, p: float = 0.5):
        self.always_apply = bool(always_apply)
        self.p = float(p)

    def apply(self, img, **params):  # pragma: no cover - overridden
        raise NotImplementedError

    def __call__(self, *, image, force_apply: bool = False, **kw):
        if self.always_apply or force_apply or _RNG.random() < self.p:
            image = self.apply(image)
        return {"image": image}


class ImageOnlyTransform(_Transform):
    """Subclassed by the reference's ``ResizeAndPadA``."""


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, *, image, **kw):
        for t in self.transforms:
            image = t(image=image)["image"]
        return {"image": image}


class ShiftScaleRotate(_Transform):
    """albumentations.ShiftScaleRotate with border_mode=0 white fill.

    Delegates to the framework's ``shift_scale_rotate``
    (`rcnn_ocr_tpu/data/transforms.py:263`), which matches the reference's
    configuration (`/root/reference/data/transforms.py:163-170`).
    """

    def __init__(self, shift_limit=0.0625, scale_limit=0.1, rotate_limit=45,
                 border_mode=0, value=(255, 255, 255), p=0.5,
                 always_apply=False):
        super().__init__(always_apply, p)
        self.shift_limit = float(shift_limit)
        self.scale_limit = float(scale_limit)
        self.rotate_limit = float(rotate_limit)
        self.value = value

    def apply(self, img, **params):
        return shift_scale_rotate(
            img, _RNG, self.shift_limit, self.scale_limit, self.rotate_limit,
            fill=self.value,
        )


class RandomBrightnessContrast(_Transform):
    def __init__(self, brightness_limit=0.2, contrast_limit=0.2, p=0.5,
                 always_apply=False):
        super().__init__(always_apply, p)
        self.brightness_limit = float(brightness_limit)
        self.contrast_limit = float(contrast_limit)

    def apply(self, img, **params):
        return random_brightness_contrast(
            img, _RNG, self.brightness_limit, self.contrast_limit
        )


class InvertImg(_Transform):
    def __init__(self, p=0.5, always_apply=False):
        super().__init__(always_apply, p)

    def apply(self, img, **params):
        return invert_img(img)


class Normalize(_Transform):
    """(x/255 - mean)/std, float32 — albumentations.Normalize defaults."""

    def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                 max_pixel_value=255.0, p=1.0, always_apply=True):
        super().__init__(always_apply=True, p=1.0)
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)
        self.max_pixel_value = float(max_pixel_value)

    def apply(self, img, **params):
        img = img.astype(np.float32) / self.max_pixel_value
        return (img - self.mean) / self.std


class ToTensorV2(_Transform):
    """HWC numpy -> CHW torch tensor (albumentations.pytorch.ToTensorV2)."""

    def __init__(self, always_apply=True, p=1.0):
        super().__init__(always_apply=True, p=1.0)

    def apply(self, img, **params):
        import torch

        return torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))


_RNG = np.random.default_rng(0)


def seed(s: int) -> None:
    """Reseed the stub's augmentation stream (per-run determinism)."""
    global _RNG
    _RNG = np.random.default_rng(s)


def install() -> None:
    """Register this module as ``albumentations`` (+ ``.pytorch``)."""
    mod = types.ModuleType("albumentations")
    for name in (
        "ImageOnlyTransform", "Compose", "ShiftScaleRotate",
        "RandomBrightnessContrast", "InvertImg", "Normalize",
    ):
        setattr(mod, name, globals()[name])
    sub = types.ModuleType("albumentations.pytorch")
    sub.ToTensorV2 = ToTensorV2
    mod.pytorch = sub
    sys.modules["albumentations"] = mod
    sys.modules["albumentations.pytorch"] = sub
