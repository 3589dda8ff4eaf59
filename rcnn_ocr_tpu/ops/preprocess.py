"""On-device image preprocessing (fused resize-pad-normalize).

The BASELINE north star names a fused on-device preprocessing path for the
`data/transforms.py` resize/normalize pipeline: instead of shipping
normalized float32 NHWC (16 bytes/pixel-group) from the host, ship raw
uint8 and do resize -> white-pad -> [-1, 1] normalize on the TPU, where it
fuses into the first convolution's input pipeline.  Host->device traffic
drops 4x and the host sheds the cv2 resize work.

Semantics match :class:`rcnn_ocr_tpu.data.transforms.ResizeAndPad` with
``align_h="left"``/``align_v="center"`` EXACTLY in the default
``method="area"`` mode: cv2's INTER_AREA (shrink) and clamped
INTER_LINEAR (grow) are expressed as dense coverage/bilinear weight
matrices — two small matmuls per image on the MXU — followed by the same
uint8 quantization cv2.resize applies, leaving every pixel within one
uint8 step of the host pipeline (tested).  ``method="linear"`` keeps the
previous `jax.image.scale_and_translate` triangle-kernel behavior.

Batched version: every image in the batch must already share a physical
canvas (e.g. images decoded at original size are first letterboxed by the
host *without* interpolation cost into a max-size uint8 canvas, carrying
their true (h, w); the device then warps each to the model canvas with one
`scale_and_translate` per image via vmap).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _coverage_weights(n_out: int, n_src: int, src_len, dst_len, origin):
    """[n_out, n_src] exact area-resampling (box-coverage) weight matrix.

    Output pixel ``r`` (placed at ``origin + [0, dst_len)``) integrates the
    source over ``[(r-origin)·src/dst, (r+1-origin)·src/dst)`` — precisely
    cv2's INTER_AREA semantics for minification, expressed as a dense
    matmul so the resize runs on the MXU.  Rows outside the placed rect
    and columns beyond the true source extent get zero weight (the caller
    fills those with white)."""
    r = jnp.arange(n_out, dtype=jnp.float32)[:, None]
    j = jnp.arange(n_src, dtype=jnp.float32)[None, :]
    inv = src_len / dst_len  # source pixels per output pixel
    lo = (r - origin) * inv
    hi = (r + 1.0 - origin) * inv
    w = jnp.clip(jnp.minimum(hi, j + 1.0) - jnp.maximum(lo, j), 0.0, None) / inv
    keep = (j < src_len) & (r >= origin) & (r < origin + dst_len)
    return jnp.where(keep, w, 0.0)


def _bilinear_weights(n_out: int, n_src: int, src_len, dst_len, origin):
    """[n_out, n_src] clamped-bilinear weight matrix (cv2 INTER_LINEAR).

    Pixel-center convention ``src = (r - origin + 0.5)·src/dst − 0.5`` with
    samples CLAMPED to the source extent (cv2 replicates edges; a
    zero-padding resampler darkens the boundary ring instead)."""
    r = jnp.arange(n_out, dtype=jnp.float32)[:, None]
    j = jnp.arange(n_src, dtype=jnp.float32)[None, :]
    inv = src_len / dst_len
    src = jnp.clip((r - origin + 0.5) * inv - 0.5, 0.0, src_len - 1.0)
    w = jnp.clip(1.0 - jnp.abs(j - src), 0.0, 1.0)
    keep = (j < src_len) & (r >= origin) & (r < origin + dst_len)
    return jnp.where(keep, w, 0.0)


_warned_crop = False  # once-per-process crop warning (host_letterbox)


def host_resize_geometry(sizes, img_h: int, img_w: int):
    """Per-image placed-rect geometry, matching ``ResizeAndPad`` bit-for-bit.

    Returns int32 ``[B, 3]`` of ``(dst_h, dst_w, y0)`` computed in float64
    with round-half-even — the same arithmetic the host transform uses.
    The device kernel's in-kernel float32 fallback can round half-boundary
    sizes to a different rect (shifting the whole placement one pixel), so
    exactness-critical callers compute geometry here and pass
    ``[h, w, dst_h, dst_w, y0]`` rows as ``sizes``.
    """
    import numpy as np

    sizes = np.asarray(sizes, dtype=np.int64)
    h = np.maximum(sizes[:, 0], 1).astype(np.float64)
    w = np.maximum(sizes[:, 1], 1).astype(np.float64)
    scale = np.minimum(img_h / h, img_w / w)
    dst_h = np.maximum(np.rint(h * scale), 1.0).astype(np.int64)
    dst_w = np.maximum(np.rint(w * scale), 1.0).astype(np.int64)
    y0 = (img_h - dst_h) // 2
    return np.stack([dst_h, dst_w, y0], axis=1).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("img_h", "img_w", "method"))
def resize_pad_normalize(
    raw: jnp.ndarray,  # [B, Hc, Wc, 3] uint8 host-decoded pixels on a canvas
    sizes: jnp.ndarray,  # [B, 2] int32 (h, w); or [B, 5] with host geometry
    img_h: int,
    img_w: int,
    method: str = "area",
) -> jnp.ndarray:
    """uint8 canvas batch -> normalized float NHWC model input.

    Each row holds a raw image in its top-left corner; the kernel scales it
    onto the model canvas preserving aspect (left-aligned, vertically
    centered), fills the rest with white, and normalizes to [-1, 1].

    ``method="area"`` (default) mirrors the host cv2 pipeline: exact
    INTER_AREA box-coverage resampling for images that shrink (as two
    weight-matrix matmuls on the MXU) and bilinear for images that grow —
    per image, like :class:`~rcnn_ocr_tpu.data.transforms.ResizeAndPad`.
    ``method="linear"`` is the previous triangle-kernel behavior.

    ``sizes`` may carry 5 columns ``[h, w, dst_h, dst_w, y0]`` (from
    :func:`host_resize_geometry`) — required for bit-level host parity:
    the in-kernel float32 geometry can round half-boundary sizes to a
    rect one pixel off the host's float64 result.
    """
    if method not in ("area", "linear"):
        raise ValueError(f"method must be 'area' or 'linear', got {method!r}")
    canvas_h, canvas_w = raw.shape[1], raw.shape[2]
    has_geometry = sizes.shape[1] >= 5

    def one(img: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
        h = jnp.maximum(size[0], 1).astype(jnp.float32)
        w = jnp.maximum(size[1], 1).astype(jnp.float32)
        if has_geometry:
            new_h = size[2].astype(jnp.float32)
            new_w = size[3].astype(jnp.float32)
            y0 = size[4].astype(jnp.float32)
            # the host transform's own interpolation pick: dst < src
            shrink = (new_h < h) | (new_w < w)
        else:
            scale = jnp.minimum(img_h / h, img_w / w)
            new_h = jnp.maximum(jnp.round(h * scale), 1.0)
            new_w = jnp.maximum(jnp.round(w * scale), 1.0)
            # map the source rect (0,0)-(h,w) onto (y0,0)-(y0+new_h,new_w)
            y0 = jnp.floor((img_h - new_h) / 2.0)
            shrink = scale < 1.0
        imgf = img.astype(jnp.float32)
        if method == "area":
            # cv2 parity, all on the MXU: INTER_AREA coverage matrices when
            # the image shrinks, clamped-bilinear matrices when it grows
            # (the scale is isotropic, so the whole image does one or the
            # other — exactly ResizeAndPad's interpolation choice)
            wh = jnp.where(
                shrink,
                _coverage_weights(img_h, canvas_h, h, new_h, y0),
                _bilinear_weights(img_h, canvas_h, h, new_h, y0),
            )
            ww = jnp.where(
                shrink,
                _coverage_weights(img_w, canvas_w, w, new_w, 0.0),
                _bilinear_weights(img_w, canvas_w, w, new_w, 0.0),
            )
            out = jnp.einsum("hH,HWc,wW->hwc", wh, imgf, ww)
            # the host pipeline materializes the resized image as uint8
            # before normalizing (cv2.resize output dtype); match that
            # quantization so device and host pixels agree bit-for-bit
            out = jnp.round(jnp.clip(out, 0.0, 255.0))
        else:
            out = jax.image.scale_and_translate(
                imgf,
                shape=(img_h, img_w, 3),
                spatial_dims=(0, 1),
                scale=jnp.array([new_h / h, new_w / w], jnp.float32),
                translation=jnp.array([y0, 0.0], jnp.float32),
                method="linear",
                antialias=True,
            )
        # mask outside the placed rect with white (255)
        rows = jnp.arange(img_h, dtype=jnp.float32)[:, None]
        cols = jnp.arange(img_w, dtype=jnp.float32)[None, :]
        inside = (
            (rows >= y0) & (rows < y0 + new_h) & (cols < new_w)
        )[..., None]
        out = jnp.where(inside, out, 255.0)
        return (out / 255.0 - 0.5) / 0.5

    return jax.vmap(one)(raw, sizes)


def host_letterbox(images, canvas_h: int, canvas_w: int) -> Tuple:
    """Paste variable-size uint8 images into a fixed uint8 canvas batch.

    Pure memcpy on the host (no interpolation, no float math) — the
    expensive work happens on device in `resize_pad_normalize`.  Images
    larger than the canvas are cropped to it (pick a canvas >= your data).
    Returns (canvas batch [B, canvas_h, canvas_w, 3], sizes [B, 2]).

    Uses the thread-pooled C++ letterbox (`native/letterbox.cpp`) when
    available — the per-image numpy paste loop tops out around the chip's
    decode rate at large canvases, making the host the serving bottleneck.
    Measured 1.44× over numpy on a single core (this dev container exposes
    one CPU; the pool scales the memcpy across cores on real hosts).
    """
    import numpy as np

    global _warned_crop
    if not _warned_crop and any(
        img.shape[0] > canvas_h or img.shape[1] > canvas_w for img in images
    ):
        _warned_crop = True
        import warnings

        warnings.warn(
            f"host_letterbox: input image(s) exceed the {canvas_h}x{canvas_w} "
            f"canvas and will be CROPPED — pass a canvas covering your data",
            stacklevel=2,
        )

    from rcnn_ocr_tpu import native

    res = native.letterbox_u8(images, canvas_h, canvas_w)
    if res is not None:
        return res

    batch = len(images)
    out = np.zeros((batch, canvas_h, canvas_w, 3), dtype=np.uint8)
    sizes = np.zeros((batch, 2), dtype=np.int32)
    for i, img in enumerate(images):
        h = min(img.shape[0], canvas_h)
        w = min(img.shape[1], canvas_w)
        out[i, :h, :w] = img[:h, :w]
        sizes[i] = (h, w)
    return out, sizes
