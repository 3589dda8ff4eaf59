"""CSV/TSV OCR dataset with validation, skip-reason accounting and
lazy bad-image recovery, plus multi-dataset proportional batch mixing.

Behavior contract (what `/root/reference/data/dataset.py` guarantees):

* delimiter auto-selected by extension (``.tsv`` -> tab, else comma) unless
  given; header auto-detected when the first cell is one of
  {file, filename, image, path, img, name};
* row screening (threaded): arity >= 2, non-empty fname/label, strict
  charset membership (with a missing-char counter), effective length
  (chars present in the charset) <= max_len, path resolution with a
  recursive basename index as fallback (ambiguous basenames counted, first
  candidate used);
* per-reason skip statistics with up to 8 examples each, reported after
  indexing;
* lazy image validation: an unreadable image is quarantined on first
  access and a random healthy sample is substituted, at most 8 retries;
* ``__getitem__`` returns ``(HWC float32 image, label str)`` — NHWC, the
  TPU-native layout (untransformed fallback divides by 255).

The implementation is this framework's own: a :class:`SkipLog` audit object
instead of parallel dicts, a guard-clause screening pipeline, and
generator-based index streams in the proportional sampler.  Deliberate
divergences from the reference, all improvements:

* torch-free — samplers are plain iterables of index lists and batching is
  done by the loader (:mod:`rcnn_ocr_tpu.data.loader`);
* deterministic sample order (the reference collected `as_completed`
  futures, making order thread-timing dependent);
* the proportional sampler's per-dataset streams exhaust a full shuffled
  pass before reshuffling (the reference throws away the tail of a pass
  whenever fewer than the quota remain);
* split views carry their own transform (no shared-transform race).
"""

from __future__ import annotations

import csv
import os
import random
import threading
from collections import Counter
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from rcnn_ocr_tpu.data.transforms import build_file_index, imread_cv2

HEADER_TOKENS = {"file", "filename", "image", "path", "img", "name"}
SKIP_REASONS = (
    "bad_row",
    "empty_fname",
    "empty_label",
    "charset",
    "too_long",
    "missing_path",
    "ambiguous",
    "readfail",
)
EXAMPLES_PER_REASON = 8


class SkipLog:
    """Audit trail for rows/images rejected during indexing or iteration.

    Collects a counter plus a capped list of example payloads per reason,
    and a frequency table of characters that fell outside the charset.
    """

    def __init__(self, reasons: Sequence[str] = SKIP_REASONS, cap: int = EXAMPLES_PER_REASON):
        self.counts: Dict[str, int] = dict.fromkeys(reasons, 0)
        self.examples: Dict[str, List] = {r: [] for r in reasons}
        self.missing_chars: Counter = Counter()
        self.cap = cap
        # note() is called from the indexing thread pool — unguarded
        # read-modify-writes lose increments and the report undercounts
        self._lock = threading.Lock()

    def note(self, reason: str, example=None) -> None:
        with self._lock:
            self.counts[reason] += 1
            if example is not None and len(self.examples[reason]) < self.cap:
                self.examples[reason].append(example)

    def total(self) -> int:
        return sum(self.counts.values())

    def render(self) -> List[str]:
        """Human-readable report lines (only non-zero reasons)."""
        lines: List[str] = []
        for reason in self.counts:
            n = self.counts[reason]
            if n == 0:
                continue
            lines.append(f"  - {reason}: {n}")
            if self.examples[reason]:
                lines.append(f"    examples: {self.examples[reason][: self.cap]}")
        if self.counts.get("charset") and self.missing_chars:
            lines.append("  Missing characters (TOP 30):")
            for ch, n in self.missing_chars.most_common(30):
                lines.append(f"    '{ch}' (U+{ord(ch):04X}, repr={ch!r}): {n}x")
        return lines


def _clean_label(raw: str) -> str:
    """NBSP -> space, strip whitespace and BOM."""
    return raw.replace(" ", " ").strip().replace("﻿", "")


def _clean_filename(raw: str) -> str:
    """Strip whitespace/BOM, Windows separators -> POSIX."""
    return raw.strip().replace("﻿", "").replace("\\", "/")


def _sniff_delimiter(csv_path: str) -> str:
    return "\t" if csv_path.lower().endswith(".tsv") else ","


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
        self._file_index = build_file_index(images_dir)
        self._encoding = encoding
        self._delimiter = delimiter if delimiter is not None else _sniff_delimiter(csv_path)
        self._has_header = has_header
        self._strict_charset = strict_charset
        self._validate_image = validate_image
        self._max_len = max_len
        self._strict_max_len = strict_max_len
        self._verbose = verbose

        self._audit = SkipLog()
        self._retry_budget = 8
        self._substitute_rng = random.Random()
        self._quarantine_announced = False

        rows = self._load_rows(csv_path)
        self.samples: List[Tuple[str, str]] = self._index_rows(rows, num_workers)
        self._n_rejected = len(rows) - len(self.samples)
        self._invalid_mask = [False] * len(self.samples)

        if verbose and self._n_rejected > 0:
            print(f"[OCRDataset] {csv_path}: skipped {self._n_rejected} rows.")
            for line in self._audit.render():
                print(line)
        if not self.samples:
            raise RuntimeError(f"No valid samples left in dataset {csv_path}!")

    # test/introspection views over the audit object ----------------------
    @property
    def _reasons(self) -> Dict[str, int]:
        return self._audit.counts

    @property
    def _examples(self) -> Dict[str, List]:
        return self._audit.examples

    @property
    def _missing_chars(self) -> Counter:
        return self._audit.missing_chars

    # -- iteration --------------------------------------------------------
    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        return self.fetch(idx)

    def fetch(self, idx: int, transform=None) -> Tuple[np.ndarray, str]:
        """``__getitem__`` with an optional per-call transform override.

        The override keeps split views (:class:`SubsetDataset`) thread-safe:
        loader threads never mutate shared dataset state to pick a transform.
        """
        if not (0 <= idx < len(self.samples)):
            raise IndexError(idx)

        if not self._validate_image:
            path, label = self.samples[idx]
            return self._finish(imread_cv2(path), transform), label

        cursor = idx
        for _ in range(self._retry_budget):
            if self._invalid_mask[cursor]:
                cursor = self._pick_substitute(cursor)
                continue
            path, label = self.samples[cursor]
            try:
                image = imread_cv2(path)
            except Exception as err:  # noqa: BLE001 — any decode failure quarantines
                self._quarantine(cursor, path, err)
                cursor = self._pick_substitute(cursor)
                continue
            return self._finish(image, transform), label

        raise RuntimeError(
            f"Gave up after {self._retry_budget} substitution attempts; "
            "too many unreadable images."
        )

    def _finish(self, image: np.ndarray, override=None) -> np.ndarray:
        fn = override if override is not None else self.transform
        if fn is None:
            return image.astype(np.float32) / 255.0
        return fn(image)

    def _quarantine(self, idx: int, path: str, error: Exception) -> None:
        """Mark a sample unreadable; it is never served again."""
        self._invalid_mask[idx] = True
        self._audit.note("readfail", f"{path} :: {type(error).__name__}")
        if self._verbose and not self._quarantine_announced:
            print(
                "[OCRDataset] Unreadable image found during iteration; "
                "quarantined samples are replaced by random healthy ones."
            )
            self._quarantine_announced = True

    def _pick_substitute(self, avoid: int) -> int:
        # quarantined samples are rare: draw-and-retry is O(1) per fetch
        # (the old full healthy-list rebuild was an O(n) scan per bad
        # fetch, every epoch, on multi-million-row datasets); the exact
        # scan remains as the correctness fallback when most rows are bad
        n = len(self.samples)
        for _ in range(32):
            i = self._substitute_rng.randrange(n)
            if i != avoid and not self._invalid_mask[i]:
                return i
        healthy = [
            i for i in range(n)
            if i != avoid and not self._invalid_mask[i]
        ]
        if not healthy:
            raise RuntimeError("Every sample is quarantined; nothing left to serve.")
        return self._substitute_rng.choice(healthy)

    # -- indexing ---------------------------------------------------------
    def _load_rows(self, csv_path: str) -> List[List[str]]:
        with open(csv_path, newline="", encoding=self._encoding) as f:
            rows = list(csv.reader(f, delimiter=self._delimiter))
        if self._has_header is None:
            self._has_header = bool(rows) and bool(rows[0]) and (
                str(rows[0][0]).strip().lower() in HEADER_TOKENS
            )
        return rows[1:] if (self._has_header and rows) else rows

    def _index_rows(self, rows: List[List[str]], num_workers: int) -> List[Tuple[str, str]]:
        if num_workers == -1:
            workers = os.cpu_count() or 4
        elif num_workers is None:
            workers = 8
        else:
            workers = max(1, num_workers)

        # `executor.map` keeps CSV order deterministic (the reference used
        # as_completed, making sample order thread-timing dependent — a real
        # nondeterminism wart we do not replicate).
        def bar(it):
            # disable=None -> tqdm auto-disables on non-tty
            from tqdm import tqdm  # noqa: PLC0415 — keep import off the hot path

            return tqdm(
                it, total=len(rows), desc="indexing dataset", unit="row",
                leave=False, disable=None if self._verbose else True,
            )

        if workers > 1 and len(rows) > 256:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                screened = list(bar(pool.map(self._screen_row, rows)))
        else:
            screened = [self._screen_row(r) for r in bar(rows)]
        return [s for s in screened if s is not None]

    def _screen_row(self, row: List[str]) -> Optional[Tuple[str, str]]:
        """One row through the screening pipeline -> (abs_path, label) or None.

        Guard order is part of the behavior contract: a row is counted under
        the FIRST reason that rejects it.
        """
        if len(row) < 2:
            self._audit.note("bad_row", row)
            return None
        fname = _clean_filename(row[0])
        label = _clean_label(row[1])
        if not fname:
            self._audit.note("empty_fname", row)
            return None
        if label == "":
            self._audit.note("empty_label", fname)
            return None
        if self._strict_charset:
            foreign = [c for c in label if c not in self.stoi]
            if foreign:
                with self._audit._lock:
                    self._audit.missing_chars.update(foreign)
                uniq = "".join(sorted(set(foreign)))[:20]
                self._audit.note("charset", (fname, label[:50], uniq))
                return None
        if self._strict_max_len and self._max_len is not None:
            if self._usable_length(label) > self._max_len:
                self._audit.note("too_long", (fname, len(label), f"eff>{self._max_len}"))
                return None
        path = self._locate_image(fname)
        if path is None or not os.path.exists(path):
            self._audit.note("missing_path", fname)
            return None
        return path, label

    def sample_path(self, idx: int) -> str:
        """Absolute image path of a sample (for size probing / bucketing)."""
        return self.samples[idx][0]

    def sample_label(self, idx: int) -> str:
        """Label string of a sample (for CTC-aware bucket assignment)."""
        return self.samples[idx][1]

    def _usable_length(self, label: str) -> int:
        """Length after dropping chars the charset cannot encode."""
        if not self._strict_charset:
            return len(label)
        return sum(c in self.stoi for c in label)

    def _locate_image(self, fname: str) -> Optional[str]:
        """Absolute path -> join with each root -> basename-index fallback."""
        if os.path.isabs(fname) and os.path.exists(fname):
            return fname
        roots = [self.images_dir] if isinstance(self.images_dir, str) else self.images_dir
        for root in roots:
            if not root:
                continue
            candidate = os.path.join(root, fname)
            if os.path.exists(candidate):
                return candidate
        matches = self._file_index.get(os.path.basename(fname).lower(), [])
        if not matches:
            return None
        if len(matches) > 1:
            self._audit.note("ambiguous", (fname, matches[:3]))
        return matches[0]


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

    def fetch(self, idx: int, transform=None):
        """Per-call transform override (wins over the subset's own)."""
        if transform is None:
            return self[idx]
        return self.dataset.fetch(self.indices[idx], transform=transform)

    def sample_path(self, idx: int) -> str:
        return self.dataset.sample_path(self.indices[idx])

    def sample_label(self, idx: int) -> str:
        return self.dataset.sample_label(self.indices[idx])


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
    """Indexes a list of datasets by ``(ds_idx, sample_idx)`` tuples."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)

    def __getitem__(self, index):
        ds_idx, sample_idx = index
        return self.datasets[ds_idx][sample_idx]

    def fetch(self, index, transform=None):
        ds_idx, sample_idx = index
        if transform is None:
            return self.datasets[ds_idx][sample_idx]
        return self.datasets[ds_idx].fetch(sample_idx, transform=transform)

    def sample_path(self, index) -> str:
        """Image path of a ``(ds_idx, sample_idx)`` sample (size probing)."""
        ds_idx, sample_idx = index
        return self.datasets[ds_idx].sample_path(sample_idx)

    def sample_label(self, index) -> str:
        ds_idx, sample_idx = index
        return self.datasets[ds_idx].sample_label(sample_idx)

    def __len__(self) -> int:
        return sum(len(ds) for ds in self.datasets)


def exact_quotas(batch_size: int, proportions) -> List[int]:
    """Per-dataset batch quotas that sum EXACTLY to ``batch_size``.

    The reference rounds each ``batch_size * prop`` independently
    (`/root/reference/data/dataset.py`), which can sum past the batch
    size (e.g. three 1/3 shares of 32 -> 11+11+11 = 33) — harmless for
    torch's dynamic shapes, but this framework compiles ONE static batch
    shape, and an oversized batch breaks grad-accum divisibility and the
    mesh sharding contract.  Largest-remainder apportionment keeps every
    quota within 1 of the reference's and the sum exact (deliberate,
    documented divergence).
    """
    floors = [int(batch_size * p) for p in proportions]
    remainders = [batch_size * p - f for p, f in zip(proportions, floors)]
    short = batch_size - sum(floors)
    for i in sorted(
        range(len(proportions)), key=lambda i: -remainders[i]
    )[:short]:
        floors[i] += 1
    return floors


class ProportionalBatchSampler:
    """Batch sampler mixing K datasets at fixed per-batch proportions.

    Behavior contract (`/root/reference/data/dataset.py` sampler): each batch
    holds ``round(batch_size * prop)`` samples per dataset; small datasets
    are oversampled by restarting; epoch length is the minimum over datasets
    of full passes; yields shuffled lists of ``(ds_idx, sample_idx)`` tuples.

    Implementation: one infinite shuffled index stream per dataset.  Unlike
    the reference, a stream finishes its current pass before reshuffling
    (the reference drops the tail of a pass whenever fewer than the quota
    remain), so every sample is seen once per pass — strictly fairer
    oversampling with the same batch composition.
    """

    def __init__(self, datasets, batch_size: int, proportions, seed: Optional[int] = None):
        if abs(sum(proportions) - 1.0) >= 1e-6:
            raise ValueError("proportions must sum to 1")
        self.datasets = list(datasets)
        self.batch_size = batch_size
        self.proportions = list(proportions)
        self._rng = np.random.default_rng(seed)
        self._quotas = exact_quotas(batch_size, proportions)
        self._streams = [self._endless_shuffle(len(ds)) for ds in self.datasets]

    def _endless_shuffle(self, n: int) -> Iterator[int]:
        while True:
            for i in self._rng.permutation(n):
                yield int(i)

    def __iter__(self):
        for _ in range(len(self)):
            batch = [
                (ds_idx, next(stream))
                for ds_idx, (quota, stream) in enumerate(zip(self._quotas, self._streams))
                for _ in range(quota)
            ]
            order = self._rng.permutation(len(batch))
            yield [batch[i] for i in order]

    def __len__(self) -> int:
        return min(
            len(ds) // max(1, quota)
            for ds, quota, prop in zip(self.datasets, self._quotas, self.proportions)
            if prop > 0
        )


class ShuffleBatchSampler:
    """Plain shuffled batching over one dataset (drop-last=False)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        order = (
            self._rng.permutation(len(self.dataset))
            if self.shuffle
            else np.arange(len(self.dataset))
        )
        for i in range(0, len(order), self.batch_size):
            yield [int(j) for j in order[i : i + self.batch_size]]

    def __len__(self) -> int:
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size


class ConcatDataset:
    """Concatenation of datasets under a single flat index."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _locate(self, idx: int) -> Tuple[int, int]:
        if idx < 0:
            idx += len(self)
        ds = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return ds, idx - int(self._offsets[ds])

    def __getitem__(self, idx: int):
        ds, local = self._locate(idx)
        return self.datasets[ds][local]

    def fetch(self, idx: int, transform=None):
        ds, local = self._locate(idx)
        if transform is None:
            return self.datasets[ds][local]
        return self.datasets[ds].fetch(local, transform=transform)

    def sample_path(self, idx: int) -> str:
        ds, local = self._locate(idx)
        return self.datasets[ds].sample_path(local)

    def sample_label(self, idx: int) -> str:
        ds, local = self._locate(idx)
        return self.datasets[ds].sample_label(local)

    @property
    def transform(self):
        """The members' shared transform (None when they differ) — lets the
        disk transform cache treat a homogeneous concat like one dataset."""
        first = getattr(self.datasets[0], "transform", None) if self.datasets else None
        for d in self.datasets[1:]:
            if getattr(d, "transform", None) is not first:
                return None
        return first
