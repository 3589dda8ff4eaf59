"""Disk-backed transform cache: decode+resize once, memmap forever.

Production input pipelines re-decode and re-resize every image every
epoch; with the recommended uint8 feed (``device_augment`` — augmentation
runs ON DEVICE, so the host transform is the deterministic
:class:`~rcnn_ocr_tpu.data.transforms.ResizeAndPad`) that host work is
pure waste after the first pass.  This cache memmaps the transform's
uint8 output rows to disk, so epochs ≥ 2 feed the chip at memcpy speed —
the JAX-native analogue of packing a dataset into fixed-shape records
(no reference counterpart; the reference decodes every epoch).

Correctness properties:

* **Deterministic transforms only**: a transform opts in by exposing a
  ``cache_key`` string (only :class:`ResizeAndPad` does — random train
  augmentations have no key, so they are never cached).
* **Keyed by content signature**: the cache digest covers every sample's
  path + label, the transform key, and the probed row shape/dtype — a
  changed CSV, charset filter, resize geometry, or sample order misses to
  a fresh cache directory.  (In-place edits to an image file's *content*
  are not detected — documented limitation, same as any mtime-free cache.)
* **Quarantine-safe**: the lazy bad-image recovery
  (`data/dataset.py`) may substitute a different sample; rows are cached
  ONLY when the served label equals the indexed sample's label, so a
  cache hit always returns a valid (image, label) pair for that index.
* **Thread/process tolerant**: loader workers fill distinct rows of the
  memmap; the per-row valid flag is set only after the row is written,
  and a re-fill writes identical bytes, so races are benign.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Callable, Optional, Tuple

import numpy as np


def _dataset_signature(dataset) -> Optional[str]:
    """Content hash over (path, label) rows; None = uncacheable dataset."""
    n = len(dataset)
    path_of = getattr(dataset, "sample_path", None)
    label_of = getattr(dataset, "sample_label", None)
    if path_of is None or label_of is None:
        return None
    h = hashlib.sha1()
    h.update(str(n).encode())
    try:
        for i in range(n):
            h.update(path_of(i).encode("utf-8", "replace"))
            h.update(b"\x00")
            h.update(label_of(i).encode("utf-8", "replace"))
            h.update(b"\x01")
    except Exception:  # noqa: BLE001 — any non-conforming view disables caching
        return None
    return h.hexdigest()


class TransformCache:
    """Memmap of ``transform(decode(sample))`` rows for one (dataset,
    deterministic-transform) pair.  Construct cheaply; the signature scan
    and file mapping happen on first use."""

    def __init__(self, dataset, transform, cache_dir: str):
        self.dataset = dataset
        self.transform = transform
        self.cache_dir = cache_dir
        self._ready = False
        self._enabled: Optional[bool] = None
        self._data = None
        self._valid = None
        self._label_of = getattr(dataset, "sample_label", None)
        self._warned_nonint = False

    # -- lazy init -----------------------------------------------------------
    def _probe_row(self) -> Optional[Tuple[tuple, np.dtype]]:
        try:
            out = self.transform(np.full((16, 16, 3), 255, np.uint8))
        except Exception:  # noqa: BLE001
            return None
        if not isinstance(out, np.ndarray) or out.dtype != np.uint8:
            return None  # only the uint8 feed is worth caching (4x bytes)
        return tuple(out.shape), out.dtype

    def _init(self) -> bool:
        if self._ready:
            return bool(self._enabled)
        self._ready = True
        self._enabled = False
        key = getattr(self.transform, "cache_key", None)
        if not key or self._label_of is None:
            return False
        sig = _dataset_signature(self.dataset)
        if sig is None:
            return False
        probed = self._probe_row()
        if probed is None:
            return False
        row_shape, dtype = probed
        n = len(self.dataset)
        digest = hashlib.sha1(
            f"{sig}|{key}|{row_shape}|{dtype}|{n}".encode()
        ).hexdigest()[:20]
        d = os.path.join(self.cache_dir, f"tc_{digest}")
        try:
            os.makedirs(d, exist_ok=True)
            meta_path = os.path.join(d, "meta.json")
            if not os.path.exists(meta_path):
                tmp = meta_path + f".tmp{os.getpid()}"
                with open(tmp, "w", encoding="utf-8") as f:
                    json.dump(
                        {
                            "n": n,
                            "row_shape": list(row_shape),
                            "dtype": str(dtype),
                            "transform": key,
                            "signature": sig,
                        },
                        f,
                    )
                os.replace(tmp, meta_path)
            data_path = os.path.join(d, "data.u8")
            valid_path = os.path.join(d, "valid.u8")
            # create-without-truncate, then ALWAYS open 'r+': the old
            # exists()->mode choice was a TOCTOU — a second process whose
            # exists() check raced the first's creation re-opened data.u8
            # with 'w+' (truncating rows already written) while inheriting
            # the first's valid flags, serving zeroed rows as cache hits
            for path, size in (
                (data_path, n * int(np.prod(row_shape)) * np.dtype(dtype).itemsize),
                (valid_path, n),
            ):
                with open(path, "ab") as f:  # O_CREAT, no truncation
                    if f.tell() < size:
                        f.truncate(size)  # extend-only (sparse zeros)
            self._data = np.memmap(
                data_path, dtype=dtype, mode="r+", shape=(n,) + row_shape
            )
            self._valid = np.memmap(valid_path, dtype=np.uint8, mode="r+", shape=(n,))
            self._row_shape = row_shape
            self._dtype = dtype
            self._enabled = True
        except Exception:  # noqa: BLE001 — unwritable cache dir etc.
            self._data = self._valid = None
            self._enabled = False
        return bool(self._enabled)

    @property
    def enabled(self) -> bool:
        return self._init()

    def hits(self) -> int:
        """Number of rows currently cached (observability/tests)."""
        return int(np.count_nonzero(self._valid)) if self.enabled else 0

    # -- the fetch path ------------------------------------------------------
    def fetch(self, idx: Any, fetch_fn: Callable[[], Tuple[np.ndarray, str]]):
        """Serve ``(image, label)`` for ``idx`` — memmap row when cached,
        else ``fetch_fn()`` (cached afterwards when safe)."""
        if not isinstance(idx, (int, np.integer)):
            # tuple (ds_idx, sample_idx) indices — the proportional
            # MultiDataset — are not cacheable by row position; say so
            # ONCE instead of silently serving every row uncached
            if not self._warned_nonint:
                self._warned_nonint = True
                print(
                    "[cache] transform cache inactive for this dataset: "
                    "non-integer sample indices (proportional "
                    "MultiDataset) — rows serve uncached"
                )
            return fetch_fn()
        if not self._init():
            return fetch_fn()
        i = int(idx)
        if 0 <= i < self._valid.shape[0] and self._valid[i]:
            return np.array(self._data[i]), self._label_of(i)
        img, label = fetch_fn()
        if (
            0 <= i < self._valid.shape[0]
            and isinstance(img, np.ndarray)
            and img.dtype == self._dtype
            and tuple(img.shape) == self._row_shape
            and label == self._label_of(i)  # quarantine substitution guard
        ):
            self._data[i] = img
            self._valid[i] = 1
        return img, label
