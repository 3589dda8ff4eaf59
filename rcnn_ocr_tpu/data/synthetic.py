"""Synthetic text-line dataset generator (PIL fonts + cv2 effects).

The reference framework trains on a handwriting corpus that is not
redistributable (its README publishes only the resulting accuracy), so a
new user cannot actually *run* the reference end-to-end.  This module
closes that gap for this framework: it renders deterministic, realistic
text-line images straight into the on-disk layout the training stack
expects (headerless ``filename,text`` CSVs — see ``data/dataset.py``; the
eval CLI's headered variant is also emitted by ``tools/
make_synthetic_dataset.py``), so every pipeline — training, evaluation,
export, serving — is runnable out of the box.

Design notes (tpu-first data story):

* Pure host-side: PIL for glyph rasterization, cv2/numpy for the effect
  chain.  No JAX import — generation is a one-off offline step, never on
  the accelerator's critical path.
* Deterministic: image ``i`` is rendered from ``default_rng([seed, i])``,
  so datasets are reproducible regardless of generation order or count.
* Variable-width lines: width grows with text length (like real line
  crops), which exercises the aspect-native bucketing pipeline rather
  than hiding behind a fixed canvas.

Difficulty presets (cumulative effect chains):

* ``clean``  — black-on-white glyphs, mild paper/ink jitter only.
* ``medium`` — + slant (shear), rotation, gaussian blur, sensor noise.
* ``hard``   — + stronger geometry, JPEG artifacts, contrast squeeze,
  background gradient.
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

try:  # PIL ships in this image; gate anyway so data/ imports never break
    from PIL import Image, ImageDraw, ImageFont

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

__all__ = [
    "discover_fonts",
    "render_line",
    "sample_texts",
    "generate_dataset",
    "DIFFICULTIES",
    "GENERATION_ALPHABET",
    "HOMOGLYPH_FREE_ALPHABET",
]

# Characters every discovered system font (DejaVu family) covers with real
# glyphs.  A deliberate subset of the shipped 194-token charset
# (configs/charset.txt): the historic Cyrillic block is excluded because
# missing glyphs rasterize as .notdef boxes and would poison labels.
#
# NOTE on ceiling accuracy: this alphabet contains Latin/Cyrillic
# homoglyph pairs (a/а, c/с, e/е, o/о, p/р, x/х, y/у and their uppers)
# that rasterize IDENTICALLY in most fonts — with random-string labels
# the same image legitimately carries different labels, so exact-match
# accuracy saturates well below 1.0 (CER is less affected).  For
# learning-curve demos or accuracy gates, pass a homoglyph-free alphabet
# (e.g. ``HOMOGLYPH_FREE_ALPHABET``) or a single-script ``--chars``.
GENERATION_ALPHABET = (
    " "
    + "abcdefghijklmnopqrstuvwxyz"
    + "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    + "0123456789"
    + "абвгдеёжзийклмнопрстуфхцчшщъыьэюя"
    + "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
    + ".,:;!?-()\"'/%№"
)

# GENERATION_ALPHABET minus visually-identical glyph pairs: the
# Latin/Cyrillic homoglyphs (a/а, c/с, e/е, o/о, p/р, x/х, y/у + upper
# twins), sans-serif I≡l, and з/З vs digit 3.  Every remaining pair is
# visually distinct in the DejaVu family, so exact-match accuracy can
# reach 1.0 on random-string labels.
HOMOGLYPH_FREE_ALPHABET = (
    " "
    + "bdfghijklmnqrstuvwz"
    + "DFGJLNQRSUVWZ"
    + "0123456789"
    + "бвгдёжийлмнптфцчшщъыьэюя"
    + "БГДЁЖИЙЛПФЦЧШЩЪЫЬЭЮЯ"
    + ".,:;!?-()\"'/%№"
)

_FONT_DIRS = ("/usr/share/fonts", "/usr/local/share/fonts")

# Effect-chain parameter ranges per difficulty.  Ranges are sampled per
# image from its private rng stream.
DIFFICULTIES: Dict[str, Dict[str, Tuple[float, float]]] = {
    "clean": {
        "paper": (235, 255),
        "ink": (0, 45),
        "shear": (0.0, 0.0),
        "rotate_deg": (0.0, 0.0),
        "blur_sigma": (0.0, 0.0),
        "noise_std": (0.0, 2.0),
        "jpeg_q": (0, 0),  # 0 = off
        "gradient": (0.0, 0.0),
    },
    "medium": {
        "paper": (215, 255),
        "ink": (0, 70),
        "shear": (-0.18, 0.18),
        "rotate_deg": (-1.5, 1.5),
        "blur_sigma": (0.0, 0.7),
        "noise_std": (1.0, 6.0),
        "jpeg_q": (0, 0),
        "gradient": (0.0, 10.0),
    },
    "hard": {
        "paper": (190, 255),
        "ink": (0, 95),
        "shear": (-0.3, 0.3),
        "rotate_deg": (-3.0, 3.0),
        "blur_sigma": (0.0, 1.1),
        "noise_std": (2.0, 12.0),
        "jpeg_q": (35, 80),
        "gradient": (0.0, 25.0),
    },
}


def discover_fonts(dirs: Sequence[str] = _FONT_DIRS) -> List[str]:
    """TrueType font files available on this host, PIL-loadable, sorted.

    Sorted for determinism: the per-image rng picks an index into this
    list, so the same seed must see the same ordering across runs.
    """
    if not _HAS_PIL:
        return []
    found: List[str] = []
    for d in dirs:
        found.extend(glob.glob(os.path.join(d, "**", "*.ttf"), recursive=True))
    usable = []
    for path in sorted(found):
        try:
            ImageFont.truetype(path, 24)
        except Exception:
            continue
        usable.append(path)
    return usable


def _draw_params(rng: np.random.Generator, spec: Dict[str, Tuple[float, float]]):
    out = {}
    for key, (lo, hi) in spec.items():
        out[key] = float(lo) if lo == hi else float(rng.uniform(lo, hi))
    return out


def render_line(
    text: str,
    font_path: str,
    *,
    img_h: int = 48,
    rng: Optional[np.random.Generator] = None,
    difficulty: str = "medium",
    max_w: int = 2048,
) -> np.ndarray:
    """Render ``text`` as an RGB uint8 line image of height ``img_h``.

    Glyphs are rasterized at 2x the target height and downsampled
    (area interpolation) so anti-aliasing survives the effect chain.
    Width is proportional to the rendered text, capped at ``max_w``.
    """
    if not _HAS_PIL:
        raise RuntimeError("PIL is required for synthetic rendering")
    if difficulty not in DIFFICULTIES:
        raise ValueError(f"difficulty must be one of {sorted(DIFFICULTIES)}")
    rng = rng if rng is not None else np.random.default_rng(0)
    p = _draw_params(rng, DIFFICULTIES[difficulty])

    render_h = img_h * 2
    font_size = int(render_h * 0.7)
    font = ImageFont.truetype(font_path, font_size)
    # Measure with a throwaway draw (getbbox is glyph-tight).
    probe = ImageDraw.Draw(Image.new("L", (4, 4)))
    bbox = probe.textbbox((0, 0), text or " ", font=font)
    text_w = max(1, bbox[2] - bbox[0])
    text_h = max(1, bbox[3] - bbox[1])
    pad_x = max(4, render_h // 6)
    # Render the FULL text (hard-capped only against pathological inputs):
    # cropping here would silently break the image↔label contract, while
    # overflowing max_w is handled below by an aspect squash, like the
    # fixed-canvas resize the reference trains with.
    canvas_w = min(int(text_w + 2 * pad_x + abs(p["shear"]) * render_h), 1 << 15)

    paper = int(p["paper"])
    ink = int(p["ink"])
    img = Image.new("L", (canvas_w, render_h), color=paper)
    draw = ImageDraw.Draw(img)
    # Vertically center the glyph box.
    y = (render_h - text_h) // 2 - bbox[1]
    draw.text((pad_x - bbox[0], y), text, font=font, fill=ink)
    arr = np.asarray(img, dtype=np.uint8)

    # --- geometry: shear (slant) then small rotation, paper-filled ---
    if p["shear"] != 0.0:
        m = np.float32([[1.0, p["shear"], -p["shear"] * render_h / 2], [0.0, 1.0, 0.0]])
        arr = cv2.warpAffine(
            arr, m, (arr.shape[1], arr.shape[0]),
            flags=cv2.INTER_LINEAR, borderValue=paper,
        )
    if p["rotate_deg"] != 0.0:
        center = (arr.shape[1] / 2, arr.shape[0] / 2)
        m = cv2.getRotationMatrix2D(center, p["rotate_deg"], 1.0)
        arr = cv2.warpAffine(
            arr, m, (arr.shape[1], arr.shape[0]),
            flags=cv2.INTER_LINEAR, borderValue=paper,
        )

    # --- photometric chain ---
    if p["gradient"] > 0.0:
        ramp = np.linspace(-p["gradient"], p["gradient"], arr.shape[1], dtype=np.float32)
        if rng.uniform() < 0.5:
            ramp = ramp[::-1]
        arr = np.clip(arr.astype(np.float32) + ramp[None, :], 0, 255).astype(np.uint8)
    if p["blur_sigma"] > 0.05:
        arr = cv2.GaussianBlur(arr, (0, 0), sigmaX=p["blur_sigma"])
    if p["noise_std"] > 0.0:
        noise = rng.normal(0.0, p["noise_std"], size=arr.shape).astype(np.float32)
        arr = np.clip(arr.astype(np.float32) + noise, 0, 255).astype(np.uint8)
    if p["jpeg_q"] > 0:
        ok, buf = cv2.imencode(".jpg", arr, [cv2.IMWRITE_JPEG_QUALITY, int(p["jpeg_q"])])
        if ok:
            arr = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)

    # Downsample to target height, width proportional (area = clean AA).
    out_w = max(8, min(max_w, int(round(arr.shape[1] * img_h / arr.shape[0]))))
    arr = cv2.resize(arr, (out_w, img_h), interpolation=cv2.INTER_AREA)
    return cv2.cvtColor(arr, cv2.COLOR_GRAY2RGB)


def sample_texts(
    n: int,
    rng: np.random.Generator,
    *,
    alphabet: str = GENERATION_ALPHABET,
    corpus: Optional[Sequence[str]] = None,
    min_words: int = 1,
    max_words: int = 3,
    min_word_len: int = 2,
    max_word_len: int = 8,
    max_len: int = 25,
) -> List[str]:
    """Sample ``n`` labels: corpus words when given, else random words
    drawn from ``alphabet`` (space excluded inside words).  Every label is
    truncated to ``max_len`` characters (the decoder's label budget)."""
    letters = [c for c in alphabet if c != " "]
    if not letters and corpus is None:
        raise ValueError("alphabet has no non-space characters")
    out: List[str] = []
    for _ in range(n):
        k = int(rng.integers(min_words, max_words + 1))
        words = []
        for _ in range(k):
            if corpus:
                words.append(str(corpus[int(rng.integers(0, len(corpus)))]))
            else:
                wl = int(rng.integers(min_word_len, max_word_len + 1))
                words.append("".join(rng.choice(letters, size=wl)))
        label = " ".join(words)[:max_len].strip()
        out.append(label or "".join(rng.choice(letters, size=1)))
    return out


def generate_dataset(
    out_dir: str,
    n: int,
    *,
    seed: int = 0,
    img_h: int = 48,
    difficulty: str = "medium",
    alphabet: str = GENERATION_ALPHABET,
    corpus: Optional[Sequence[str]] = None,
    labels: Optional[Sequence[str]] = None,
    fonts: Optional[Sequence[str]] = None,
    csv_name: str = "labels.csv",
    header: bool = False,
    max_len: int = 25,
    ext: str = ".png",
) -> Tuple[str, str]:
    """Render a dataset into ``out_dir``; returns ``(csv_path, out_dir)``.

    Layout matches the reference's training data contract
    (`/root/reference/README.md` dataset section): one directory of image
    files plus a ``filename,text`` CSV (headerless by default — training
    convention; pass ``header=True`` for the eval CLI's headered form).
    """
    fonts = list(fonts) if fonts else discover_fonts()
    if not fonts:
        raise RuntimeError("no usable TrueType fonts found — pass fonts=[...]")
    os.makedirs(out_dir, exist_ok=True)
    if labels is None:
        labels = sample_texts(
            n, np.random.default_rng([seed, 0xA11CE]),
            alphabet=alphabet, corpus=corpus, max_len=max_len,
        )
    else:
        labels = [str(t)[:max_len] for t in labels][:n]
    csv_path = os.path.join(out_dir, csv_name)
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        wr = csv.writer(f)
        if header:
            wr.writerow(["filename", "text"])
        for i, label in enumerate(labels):
            rng = np.random.default_rng([seed, i])
            font = fonts[int(rng.integers(0, len(fonts)))]
            img = render_line(
                label, font, img_h=img_h, rng=rng, difficulty=difficulty
            )
            fname = f"syn_{i:06d}{ext}"
            ok = cv2.imwrite(
                os.path.join(out_dir, fname), cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            )
            if not ok:  # pragma: no cover - disk full / bad ext
                raise IOError(f"cv2.imwrite failed for {fname}")
            wr.writerow([fname, label])
    return csv_path, out_dir
