"""CSV/TSV OCR dataset with validation, skip-reason accounting and
lazy bad-image recovery, plus multi-dataset proportional batch mixing.

Behavior contract mirrors `/root/reference/data/dataset.py`:

* delimiter auto-selected by extension (``.tsv`` -> tab, else comma) unless
  given; header auto-detected when the first cell is one of
  {file, filename, image, path, img, name};
* row validation (threaded): arity >= 2, non-empty fname/label, strict
  charset membership (with a missing-char counter), effective length
  (chars present in the charset) <= max_len, path resolution with a
  recursive basename index as fallback (ambiguous basenames counted, first
  candidate used);
* per-reason skip statistics with up to 8 examples each, printed after
  indexing;
* lazy image validation: an unreadable image is marked invalid on first
  access and a random valid sample is substituted, at most 8 retries;
* ``__getitem__`` returns ``(HWC float32 image, label str)`` — NHWC, the
  TPU-native layout (untransformed fallback divides by 255).

This module is torch-free: samplers are plain iterables of index lists and
batching is done by the loader (:mod:`rcnn_ocr_tpu.data.loader`).
"""

from __future__ import annotations

import csv
import os
import random
from collections import Counter
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from rcnn_ocr_tpu.data.transforms import build_file_index, imread_cv2

HEADER_TOKENS = {"file", "filename", "image", "path", "img", "name"}
SKIP_REASONS = [
    "bad_row",
    "empty_fname",
    "empty_label",
    "charset",
    "too_long",
    "missing_path",
    "ambiguous",
    "readfail",
]


class OCRDataset:
    """A validated (image path, label) dataset backed by a CSV/TSV file."""

    def __init__(
        self,
        csv_path: str,
        images_dir,
        stoi: Dict[str, int],
        img_height: int = 32,
        img_max_width: int = 128,
        encoding: str = "utf-8",
        transform: Optional[Callable] = None,
        num_workers: int = -1,
        delimiter: Optional[str] = None,
        has_header: Optional[bool] = None,
        strict_charset: bool = True,
        validate_image: bool = True,
        max_len: Optional[int] = None,
        strict_max_len: bool = True,
        verbose: bool = True,
    ):
        self.images_dir = images_dir
        self.img_h = img_height
        self.img_w = img_max_width
        self.stoi = stoi
        self.transform = transform
        self.samples: List[Tuple[str, str]] = []
        self._file_index = build_file_index(images_dir)
        self._encoding = encoding
        self._delimiter = (
            delimiter
            if delimiter is not None
            else ("\t" if csv_path.lower().endswith(".tsv") else ",")
        )
        self._has_header = has_header
        self._strict_charset = strict_charset
        self._validate_image = validate_image
        self._max_len = max_len
        self._strict_max_len = strict_max_len
        self._verbose = verbose

        self._reasons = {k: 0 for k in SKIP_REASONS}
        self._examples: Dict[str, List] = {k: [] for k in SKIP_REASONS}
        self._EX_MAX = 8
        self._missing_chars: Counter = Counter()

        rows = self._read_rows(csv_path)
        rows = self._maybe_strip_header(rows)
        self._build_samples(rows, num_workers)

        self._invalid_mask = [False] * len(self.samples)
        self._lazy_warned = False
        self._lazy_skipped = 0
        self._max_getitem_retries = 8

        self._print_summary(csv_path)
        if not self.samples:
            raise RuntimeError(f"No valid samples left in dataset {csv_path}!")

    # -- indexing ---------------------------------------------------------
    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        return self.fetch(idx)

    def fetch(self, idx: int, transform=None) -> Tuple[np.ndarray, str]:
        """__getitem__ with an optional per-call transform override.

        The override keeps split views (`SubsetDataset`) thread-safe: loader
        threads never mutate shared dataset state to select a transform.
        """
        if not (0 <= idx < len(self.samples)):
            raise IndexError(idx)

        if not self._validate_image:
            abs_path, label = self.samples[idx]
            img = imread_cv2(abs_path)
            return self._apply_transform(img, transform), label

        attempts = self._max_getitem_retries
        current = idx
        while attempts > 0:
            abs_path, label = self.samples[current]
            if self._invalid_mask[current]:
                current = self._choose_alternative_index(current)
                attempts -= 1
                continue
            try:
                img = imread_cv2(abs_path)
            except Exception as e:
                self._mark_sample_invalid(current, abs_path, e)
                current = self._choose_alternative_index(current)
                attempts -= 1
                continue
            return self._apply_transform(img, transform), label

        raise RuntimeError("Failed to fetch a valid sample after lazy validation retries.")

    def _apply_transform(self, img: np.ndarray, override=None) -> np.ndarray:
        transform = override if override is not None else self.transform
        if transform is not None:
            return transform(img)
        return img.astype(np.float32) / 255.0

    def _mark_sample_invalid(self, idx: int, abs_path: str, error: Exception) -> None:
        self._invalid_mask[idx] = True
        self._reasons["readfail"] += 1
        if len(self._examples["readfail"]) < self._EX_MAX:
            self._examples["readfail"].append(f"{abs_path} :: {type(error).__name__}")
        self._lazy_skipped += 1
        if not self._lazy_warned and self._verbose:
            print(
                "[OCRDataset] Lazy validation found unreadable images; "
                "they will be skipped during iteration."
            )
            self._lazy_warned = True

    def _choose_alternative_index(self, bad_idx: int) -> int:
        candidates = [
            i for i, invalid in enumerate(self._invalid_mask) if not invalid and i != bad_idx
        ]
        if candidates:
            return random.choice(candidates)
        raise RuntimeError("No valid samples remain after filtering unreadable images.")

    # -- parsing ----------------------------------------------------------
    def _read_rows(self, csv_path: str) -> List[List[str]]:
        with open(csv_path, newline="", encoding=self._encoding) as f:
            return list(csv.reader(f, delimiter=self._delimiter))

    def _maybe_strip_header(self, rows: List[List[str]]) -> List[List[str]]:
        if self._has_header is None:
            if rows and rows[0]:
                head0 = str(rows[0][0]).strip().lower()
                self._has_header = head0 in HEADER_TOKENS
            else:
                self._has_header = False
        if self._has_header and rows:
            return rows[1:]
        return rows

    @staticmethod
    def _norm_label(s: str) -> str:
        return s.replace("\u00a0", " ").strip().replace("\ufeff", "")

    @staticmethod
    def _norm_fname(s: str) -> str:
        return s.strip().replace("\ufeff", "").replace("\\", "/")

    def _resolve_path(self, fname: str) -> Optional[str]:
        if os.path.isabs(fname) and os.path.exists(fname):
            return fname
        roots = [self.images_dir] if isinstance(self.images_dir, str) else self.images_dir
        for root in roots:
            if not root:
                continue
            p = os.path.join(root, fname)
            if os.path.exists(p):
                return p
        base = os.path.basename(fname).lower()
        candidates = self._file_index.get(base, [])
        if not candidates:
            return None
        if len(candidates) > 1:
            self._reasons["ambiguous"] += 1
            if len(self._examples["ambiguous"]) < self._EX_MAX:
                self._examples["ambiguous"].append((fname, candidates[:3]))
        return candidates[0]

    def _effective_len(self, label: str) -> int:
        if not self._strict_charset:
            return len(label)
        return sum(1 for c in label if c in self.stoi)

    def _validate_row(self, row: List[str]) -> Optional[Tuple[str, str]]:
        def skip(reason: str, example) -> None:
            self._reasons[reason] += 1
            if len(self._examples[reason]) < self._EX_MAX:
                self._examples[reason].append(example)

        if len(row) < 2:
            skip("bad_row", row)
            return None
        fname = self._norm_fname(row[0])
        label = self._norm_label(row[1])
        if not fname:
            skip("empty_fname", row)
            return None
        if label == "":
            skip("empty_label", fname)
            return None
        if self._strict_charset:
            missing = [c for c in label if c not in self.stoi]
            if missing:
                self._missing_chars.update(missing)
                uniq = "".join(sorted(set(missing)))[:20]
                skip("charset", (fname, label[:50], uniq))
                return None
        if self._strict_max_len and self._max_len is not None:
            if self._effective_len(label) > self._max_len:
                skip("too_long", (fname, len(label), f"eff>{self._max_len}"))
                return None
        abs_path = self._resolve_path(fname)
        if not abs_path or not os.path.exists(abs_path):
            skip("missing_path", fname)
            return None
        return abs_path, label

    def _build_samples(self, rows: List[List[str]], num_workers: int) -> None:
        if num_workers == -1:
            workers = os.cpu_count() or 4
        elif num_workers is None:
            workers = 8
        else:
            workers = max(1, num_workers)

        # `executor.map` keeps the CSV order deterministic (the reference used
        # as_completed, making sample order thread-timing dependent — a real
        # nondeterminism wart we do not replicate)
        if workers > 1 and len(rows) > 256:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                results = list(ex.map(self._validate_row, rows))
        else:
            results = [self._validate_row(r) for r in rows]
        self.samples = [r for r in results if r is not None]
        self._skipped = len(rows) - len(self.samples)

    def _print_summary(self, csv_path: str) -> None:
        if self._skipped <= 0 or not self._verbose:
            return
        print(f"[OCRDataset] {csv_path}: skipped {self._skipped} rows.")
        for k in SKIP_REASONS:
            cnt = self._reasons[k]
            if cnt > 0:
                print(f"  - {k}: {cnt}")
                ex = self._examples[k]
                if ex:
                    print(f"    examples: {ex[: self._EX_MAX]}")
        if self._reasons["charset"] > 0 and self._missing_chars:
            print("  Missing characters (TOP 30):")
            for ch, cnt in self._missing_chars.most_common(30):
                print(f"    '{ch}' (U+{ord(ch):04X}, repr={ch!r}): {cnt}x")


class SubsetDataset:
    """A view over a parent dataset restricted to given indices.

    Torch-free replacement for ``torch.utils.data.Subset``; unlike the
    reference's ``random_split`` + shared-transform mutation wart
    (`/root/reference/training/train.py:375-376` — both splits share one
    dataset object, so the transform set last silently wins for both), each
    subset can carry its *own* transform override.
    """

    def __init__(self, dataset, indices: Sequence[int], transform: Optional[Callable] = None):
        self.dataset = dataset
        self.indices = list(indices)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int):
        if self.transform is not None and hasattr(self.dataset, "fetch"):
            return self.dataset.fetch(self.indices[idx], transform=self.transform)
        return self.dataset[self.indices[idx]]


def random_split(
    dataset, n_train: int, n_val: int, seed: int = 42
) -> Tuple[SubsetDataset, SubsetDataset]:
    """Deterministic random train/val split."""
    if n_train + n_val > len(dataset):
        raise ValueError("split sizes exceed dataset length")
    perm = np.random.default_rng(seed).permutation(len(dataset))
    return (
        SubsetDataset(dataset, perm[:n_train].tolist()),
        SubsetDataset(dataset, perm[n_train : n_train + n_val].tolist()),
    )


class MultiDataset:
    """Indexes a list of datasets by ``(ds_idx, sample_idx)`` tuples.

    Reference parity: `/root/reference/data/dataset.py:337-346`.
    """

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)

    def __getitem__(self, index):
        ds_idx, sample_idx = index
        return self.datasets[ds_idx][sample_idx]

    def __len__(self) -> int:
        return sum(len(ds) for ds in self.datasets)


class ProportionalBatchSampler:
    """Batch sampler mixing K datasets at fixed per-batch proportions.

    Reference parity (`/root/reference/data/dataset.py:299-334`): each batch
    draws ``round(batch_size * prop)`` samples per dataset; exhausted
    datasets reshuffle and restart (oversampling small sets); epoch length =
    min over datasets of full passes; yields shuffled lists of
    ``(ds_idx, sample_idx)`` tuples.
    """

    def __init__(self, datasets, batch_size: int, proportions, seed: Optional[int] = None):
        assert abs(sum(proportions) - 1.0) < 1e-6, "proportions must sum to 1"
        self.datasets = list(datasets)
        self.batch_size = batch_size
        self.proportions = list(proportions)
        self._rng = random.Random(seed)
        self.idxs = [list(range(len(ds))) for ds in self.datasets]
        for idxs in self.idxs:
            self._rng.shuffle(idxs)

    def __iter__(self):
        for _ in range(len(self)):
            batch = []
            for ds_idx, prop in enumerate(self.proportions):
                n = int(round(self.batch_size * prop))
                if n == 0:
                    continue
                if len(self.idxs[ds_idx]) < n:
                    self.idxs[ds_idx] = list(range(len(self.datasets[ds_idx])))
                    self._rng.shuffle(self.idxs[ds_idx])
                chosen = [self.idxs[ds_idx].pop() for _ in range(n)]
                batch.extend((ds_idx, c) for c in chosen)
            self._rng.shuffle(batch)
            yield batch

    def __len__(self) -> int:
        return min(
            len(ds) // max(1, int(round(self.batch_size * prop)))
            for ds, prop in zip(self.datasets, self.proportions)
            if prop > 0
        )


class ShuffleBatchSampler:
    """Plain shuffled batching over one dataset (drop-last=False)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = random.Random(seed)

    def __iter__(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            yield order[i : i + self.batch_size]

    def __len__(self) -> int:
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size


class ConcatDataset:
    """Concatenation of datasets under a single flat index."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += len(self)
        ds = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[ds][idx - int(self._offsets[ds])]
