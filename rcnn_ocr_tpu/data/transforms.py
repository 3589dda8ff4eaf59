"""Host-side image transforms: resize-pad, augmentation, normalization.

First-party replacements for the reference's albumentations pipeline
(`/root/reference/data/transforms.py:62-120,160-193`), implemented directly
on NumPy/OpenCV:

* :class:`ResizeAndPad` — aspect-preserving resize onto a white 255 canvas,
  left/center alignment, INTER_AREA when shrinking else INTER_LINEAR;
* :func:`shift_scale_rotate` — the affine augmentation (white border fill);
* :func:`random_brightness_contrast`, :func:`invert_img`;
* normalization to ``(x/255 - 0.5) / 0.5`` = [-1, 1].

Output is NHWC float32 (the TPU-native layout) — the reference emitted CHW
torch tensors; conversion happens only in the torch-interop tools.

A transform is a callable ``(image HWC uint8, rng) -> HWC float32``; the
train transform draws randomness from a supplied ``numpy.random.Generator``
so data workers are reproducible and independent.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence

import cv2
import numpy as np

# Our loader parallelizes across images with Python threads; OpenCV's
# internal per-image threading only fights XLA's thread pools (and can
# deadlock OpenMP on small hosts), so it is disabled globally.
cv2.setNumThreads(0)

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}


def build_file_index(roots, exts=IMG_EXTS) -> Dict[str, List[str]]:
    """Recursive walk of image roots -> {lowercased basename: [abs paths]}.

    Reference parity: `/root/reference/data/transforms.py:12-26`.
    """
    if isinstance(roots, str):
        roots = [roots]
    index: Dict[str, List[str]] = defaultdict(list)
    for root in roots:
        if not root or not os.path.isdir(root):
            continue
        for dirpath, _, filenames in os.walk(root):
            for fn in filenames:
                ext = os.path.splitext(fn)[1].lower()
                if exts and ext not in exts:
                    continue
                index[fn.lower()].append(os.path.join(dirpath, fn))
    return index


def imdecode_cv2(data) -> np.ndarray:
    """Encoded image bytes (PNG/JPEG/...) -> RGB uint8 HWC.

    The wire-input twin of :func:`imread_cv2`, shared by the serving
    daemon (`rcnn_ocr_tpu/serving.py`) and any bytes-borne input path.
    """
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("Failed to decode image bytes")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imread_cv2(path: str) -> np.ndarray:
    """Unicode-safe image read -> RGB uint8 HWC.

    Reference parity: `/root/reference/data/transforms.py:29-36`.
    """
    data = np.fromfile(path, dtype=np.uint8)
    img = cv2.imdecode(data, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"Failed to read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def image_size(path: str) -> "tuple[int, int]":
    """(height, width) from the file header without decoding the pixels.

    Width bucketing (SURVEY.md §5.7) needs every sample's aspect ratio up
    front; parsing PNG/JPEG/BMP/GIF headers is ~1000x cheaper than a full
    decode.  Unknown formats fall back to a real read.
    """
    with open(path, "rb") as f:
        head = f.read(32)
        if head.startswith(b"\x89PNG\r\n\x1a\n") and head[12:16] == b"IHDR":
            w = int.from_bytes(head[16:20], "big")
            h = int.from_bytes(head[20:24], "big")
            return h, w
        if head.startswith(b"BM") and len(head) >= 26:
            # dib header size at offset 14 picks the field layout: the
            # 12-byte OS/2 BITMAPCOREHEADER stores int16 w/h at 18/20;
            # everything newer (BITMAPINFOHEADER 40+) int32 at 18/22 —
            # parsing core-header files with the 40-byte offsets yields
            # multi-million-pixel nonsense (round-4 review)
            dib = int.from_bytes(head[14:18], "little")
            if dib == 12:
                w = int.from_bytes(head[18:20], "little", signed=True)
                h = int.from_bytes(head[20:22], "little", signed=True)
            else:
                w = int.from_bytes(head[18:22], "little", signed=True)
                h = int.from_bytes(head[22:26], "little", signed=True)
            if w != 0 and h != 0:
                return abs(h), abs(w)
            # zero dims = a header this parser doesn't understand; fall
            # through to the decode below
        elif head[:6] in (b"GIF87a", b"GIF89a"):
            w = int.from_bytes(head[6:8], "little")
            h = int.from_bytes(head[8:10], "little")
            return h, w
        elif head.startswith(b"\xff\xd8"):  # JPEG: walk segments to SOF
            f.seek(2)
            swap = False  # EXIF orientation 5-8 = decoded image transposed
            while True:
                seg = f.read(4)
                if len(seg) < 4 or seg[0] != 0xFF:
                    break
                marker, size = seg[1], int.from_bytes(seg[2:4], "big")
                if marker == 0xE1 and size > 8:  # APP1: maybe EXIF
                    body = f.read(size - 2)
                    orient = _exif_orientation(body)
                    if orient in (5, 6, 7, 8):
                        swap = True
                    continue
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    sof = f.read(5)
                    h = int.from_bytes(sof[1:3], "big")
                    w = int.from_bytes(sof[3:5], "big")
                    # cv2.imdecode auto-applies EXIF rotation, so the
                    # probed size must match the DECODED orientation or
                    # bucketing / canvas="auto" see an inverted aspect
                    return (w, h) if swap else (h, w)
                f.seek(size - 2, os.SEEK_CUR)
    img = imread_cv2(path)
    return img.shape[0], img.shape[1]


def _exif_orientation(app1: bytes) -> int:
    """EXIF orientation (tag 0x0112) from a JPEG APP1 body, 0 if absent.

    Minimal TIFF walk — enough to know whether the decoder will transpose
    the image (orientations 5-8); anything unparseable returns 0."""
    try:
        if not app1.startswith(b"Exif\x00\x00"):
            return 0
        tiff = app1[6:]
        if tiff[:2] == b"II":
            bo = "little"
        elif tiff[:2] == b"MM":
            bo = "big"
        else:
            return 0
        ifd0 = int.from_bytes(tiff[4:8], bo)
        n = int.from_bytes(tiff[ifd0 : ifd0 + 2], bo)
        for i in range(n):
            e = ifd0 + 2 + 12 * i
            tag = int.from_bytes(tiff[e : e + 2], bo)
            if tag == 0x0112:
                return int.from_bytes(tiff[e + 8 : e + 10], bo)
        return 0
    except Exception:
        return 0


def ensure_rgb(img: np.ndarray) -> np.ndarray:
    """Gray (HxW or HxWx1) / RGBA -> RGB uint8."""
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]  # HxWx1 grayscale (np.expand_dims et al.)
    if img.ndim == 2:
        return cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    if img.shape[2] == 4:
        return cv2.cvtColor(img, cv2.COLOR_RGBA2RGB)
    return img


def load_rgb_uint8(image) -> np.ndarray:
    """Any accepted inference input -> RGB uint8 HWC.

    THE input-canonicalization policy shared by every serving surface
    (`OCRInference`, exported artifacts): path -> unicode-safe read; PIL ->
    RGB convert; ndarray -> gray/RGBA to RGB, with non-uint8 pixel values
    treated as 0..255-scaled (the reference's A.Normalize
    ``max_pixel_value=255`` contract, `/root/reference/data/transforms.py:
    185-193`) and quantized so all inputs ride the uint8 feed + exact
    device-normalize LUT.
    """
    if isinstance(image, str):
        if not os.path.exists(image):
            raise FileNotFoundError(f"Image file not found: {image}")
        return imread_cv2(image)
    if isinstance(image, np.ndarray):
        if image.dtype != np.uint8:
            image = np.clip(np.rint(image), 0, 255).astype(np.uint8)
            return ensure_rgb(image)
        return ensure_rgb(image.copy())
    if hasattr(image, "convert"):  # PIL, duck-typed to avoid the import
        return np.array(image.convert("RGB"))
    raise ValueError(f"Unsupported image type: {type(image)}")


class ResizeAndPad:
    """Aspect-preserving resize pasted onto a white canvas.

    Geometry contract (`/root/reference/data/transforms.py:62-120`):
    scale = min(img_h/h, img_w/w); new size >= 1px; INTER_AREA when either
    dimension shrinks, else INTER_LINEAR; paste at left (h) / center (v) by
    default on a 255-filled canvas.
    """

    _START, _END = ("left", "top"), ("right", "bottom")

    def __init__(self, img_h=32, img_w=256, align_h="left", align_v="center"):
        self.img_h = int(img_h)
        self.img_w = int(img_w)
        self.align_h = align_h
        self.align_v = align_v

    @property
    def cache_key(self) -> str:
        """Deterministic-transform identity for the on-disk transform
        cache (`rcnn_ocr_tpu.data.cache`) — random augmentations carry no
        key and are never cached."""
        return f"ResizeAndPad:{self.img_h}:{self.img_w}:{self.align_h}:{self.align_v}"

    @classmethod
    def _origin(cls, align: str, span: int, extent: int) -> int:
        """Paste offset of a span inside an extent, clamped into range."""
        if align in cls._START:
            off = 0
        elif align in cls._END:
            off = extent - span
        else:
            off = (extent - span) // 2
        return min(max(off, 0), extent - span)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        img = ensure_rgb(img)
        src_h, src_w = img.shape[:2]

        scale = min(self.img_h / max(src_h, 1), self.img_w / max(src_w, 1))
        dst_w = max(1, int(round(src_w * scale)))
        dst_h = max(1, int(round(src_h * scale)))

        shrinking = dst_h < src_h or dst_w < src_w
        resized = cv2.resize(
            img, (dst_w, dst_h),
            interpolation=cv2.INTER_AREA if shrinking else cv2.INTER_LINEAR,
        )

        canvas = np.full((self.img_h, self.img_w, 3), 255, dtype=img.dtype)
        x = self._origin(self.align_h, dst_w, self.img_w)
        y = self._origin(self.align_v, dst_h, self.img_h)
        canvas[y : y + dst_h, x : x + dst_w] = resized
        return canvas


def shift_scale_rotate(
    img: np.ndarray,
    rng: np.random.Generator,
    shift_limit: float = 0.03,
    scale_limit: float = 0.08,
    rotate_limit: float = 3.0,
    fill=(255, 255, 255),
) -> np.ndarray:
    """Random affine: rotation about center + isotropic scale + translation.

    Matches albumentations.ShiftScaleRotate semantics: angle ~ U(-rot, rot)
    degrees, scale ~ 1 + U(-s, s), shift ~ U(-sh, sh) * (w, h); constant
    white border (border_mode=0, value=255).
    """
    h, w = img.shape[:2]
    angle = rng.uniform(-rotate_limit, rotate_limit)
    scale = 1.0 + rng.uniform(-scale_limit, scale_limit)
    dx = rng.uniform(-shift_limit, shift_limit) * w
    dy = rng.uniform(-shift_limit, shift_limit) * h
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, scale)
    m[0, 2] += dx
    m[1, 2] += dy
    return cv2.warpAffine(
        img, m, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
        borderValue=fill,
    )


def random_brightness_contrast(
    img: np.ndarray,
    rng: np.random.Generator,
    brightness_limit: float = 0.2,
    contrast_limit: float = 0.2,
) -> np.ndarray:
    """alpha = 1+U(-c, c) contrast about the mid-gray, beta = U(-b, b)*255."""
    alpha = 1.0 + rng.uniform(-contrast_limit, contrast_limit)
    beta = rng.uniform(-brightness_limit, brightness_limit) * 255.0
    out = img.astype(np.float32) * alpha + beta + 127.5 * (1 - alpha)
    return np.clip(out, 0, 255).astype(img.dtype)


def invert_img(img: np.ndarray) -> np.ndarray:
    return 255 - img


def random_edge_crop(
    img: np.ndarray,
    rng: np.random.Generator,
    limit: float = 0.35,
) -> np.ndarray:
    """Clip a thin strip off the left or right edge (label-preserving).

    Long-line tiling (`rcnn_ocr_tpu/long_lines.py`) presents the decoder
    with characters CUT at tile boundaries — a condition the training
    distribution otherwise never contains (``ResizeAndPad`` always shows
    whole lines), which PERF.md round 4 diagnosed as the root cause of
    the attention heads' long-line error plateau (edge-truncated glyphs
    derail the autoregressive LSTM state).  This augmentation simulates
    that boundary: crop ``U(0.05, limit) * img_h`` pixels (glyph widths
    scale with line height, so height is the right yardstick) from one
    side.  The label is untouched — the cut clips at most roughly half a
    character, teaching the decoder to read clipped edge glyphs from
    context instead of derailing.  No reference counterpart (the
    reference has no tiling to train for).
    """
    h, w = img.shape[:2]
    crop = int(round(rng.uniform(0.05, limit) * h))
    if crop <= 0 or crop >= w // 4:
        return img
    if rng.random() < 0.5:
        return img[:, crop:]
    return img[:, : w - crop]


def normalize_unit(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (Normalize(mean=std=0.5))."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5


def get_train_transform(
    params: dict, img_h: int, img_w: int
) -> Callable[[np.ndarray, np.random.Generator], np.ndarray]:
    """Compose the training augmentation pipeline from config keys.

    Key names and defaults match `/root/reference/data/transforms.py:160-182`.
    """
    resize = ResizeAndPad(img_h=img_h, img_w=img_w)
    shift = round(float(params.get("shift_limit", 0.03)), 4)
    scale = round(float(params.get("scale_limit", 0.08)), 4)
    rot = int(params.get("rotate_limit", 3))
    p_ssr = round(float(params.get("p_ShiftScaleRotate", 0.3)), 4)
    bright = round(float(params.get("brightness_limit", 0.2)), 4)
    contrast = round(float(params.get("contrast_limit", 0.2)), 4)
    p_bc = round(float(params.get("p_BrightnessContrast", 0.3)), 4)
    p_inv = round(float(params.get("invert_p", 0.0)), 4)
    # tile-edge truncation (long-line robustness; default OFF = reference
    # parity) — must run on the RAW image, before the resize
    p_edge = round(float(params.get("p_EdgeCrop", 0.0)), 4)
    edge_limit = round(float(params.get("edge_crop_limit", 0.35)), 4)

    def transform(img: np.ndarray, rng: Optional[np.random.Generator] = None):
        rng = rng if rng is not None else np.random.default_rng()
        if p_edge and rng.random() < p_edge:
            img = random_edge_crop(img, rng, edge_limit)
        img = resize(img)
        if rng.random() < p_ssr:
            img = shift_scale_rotate(img, rng, shift, scale, rot)
        if rng.random() < p_bc:
            img = random_brightness_contrast(img, rng, bright, contrast)
        if rng.random() < p_inv:
            img = invert_img(img)
        return normalize_unit(img)

    return transform


def get_val_transform(
    img_h: int, img_w: int
) -> Callable[[np.ndarray, Optional[np.random.Generator]], np.ndarray]:
    """ResizeAndPad + normalize, no augmentation."""
    resize = ResizeAndPad(img_h=img_h, img_w=img_w)

    def transform(img: np.ndarray, rng: Optional[np.random.Generator] = None):
        return normalize_unit(resize(img))

    return transform
