"""Shared test utilities: synthetic OCR dataset generation."""

import csv
import os
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


def render_text_image(
    text: str, h: int = 24, w: int = 96, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Draw text on a white canvas (RGB uint8) — a minimal synthetic line."""
    img = np.full((h, w, 3), 255, dtype=np.uint8)
    cv2.putText(
        img, text, (2, h - 6), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1, cv2.LINE_AA
    )
    if rng is not None:
        noise = rng.integers(-8, 8, size=img.shape, dtype=np.int16)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return img


def make_synthetic_dataset(
    root: str,
    labels: Sequence[str],
    delimiter: str = ",",
    header: bool = False,
    ext: str = ".png",
    csv_name: str = "labels.csv",
) -> Tuple[str, str]:
    """Write label images + a CSV into ``root``; returns (csv_path, root)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    csv_path = os.path.join(root, csv_name)
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        wr = csv.writer(f, delimiter=delimiter)
        if header:
            wr.writerow(["filename", "text"])
        for i, label in enumerate(labels):
            fname = f"img_{i:04d}{ext}"
            img = render_text_image(label, rng=rng)
            cv2.imwrite(os.path.join(root, fname), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            wr.writerow([fname, label])
    return csv_path, root


def tiny_labels(n: int, alphabet: str = "abcdefghij", seed: int = 0) -> List[str]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = int(rng.integers(1, 5))
        out.append("".join(rng.choice(list(alphabet), size=k)))
    return out
