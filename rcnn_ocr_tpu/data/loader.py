"""Batch assembly and device feeding.

Replaces ``torch.utils.data.DataLoader`` (+ its worker processes) with a
TPU-appropriate design:

* images are decoded/augmented on host threads (OpenCV releases the GIL)
  via a `ThreadPoolExecutor`;
* batches are assembled as NumPy NHWC arrays plus packed int32 targets
  (`pack_attention_targets` / `pack_ctc_targets`);
* a background prefetch thread keeps a small queue of ready batches so the
  TPU never waits on the host (double buffering across the host->device
  boundary);
* last partial batches are padded up to ``batch_size`` with repeated
  samples and a ``valid`` mask, so every device step sees one static shape
  and XLA compiles exactly once.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from rcnn_ocr_tpu.vocab.charset import Charset, pack_attention_targets, pack_ctc_targets


def collate_batch(
    items: Sequence,
    charset: Charset,
    max_len: int,
    batch_size: Optional[int] = None,
    with_ctc: bool = False,
) -> Dict[str, np.ndarray]:
    """Stack (image, label) pairs into a fixed-shape NHWC training batch.

    When ``batch_size`` is given and the batch is short, rows are repeated
    to pad up to the static shape; ``valid`` marks the real rows.
    """
    imgs, labels = zip(*items)
    n_real = len(imgs)
    images = np.stack(imgs).astype(np.float32)
    valid = np.ones((n_real,), dtype=np.bool_)
    labels = list(labels)

    if batch_size is not None and n_real < batch_size:
        reps = batch_size - n_real
        pad_idx = np.arange(reps) % n_real
        images = np.concatenate([images, images[pad_idx]], axis=0)
        labels = labels + [labels[i] for i in pad_idx]
        valid = np.concatenate([valid, np.zeros((reps,), dtype=np.bool_)])

    text_in, target_y, lengths = pack_attention_targets(labels, charset.stoi, max_len)
    batch = {
        "image": images,
        "text_in": text_in,
        "target_y": target_y,
        "lengths": lengths,
        "valid": valid,
        "labels": labels,  # host-side strings for metric decoding
    }
    if with_ctc:
        ctc_labels, ctc_paddings = pack_ctc_targets(labels, charset, max_len)
        batch["ctc_labels"] = ctc_labels
        batch["ctc_paddings"] = ctc_paddings
    return batch


class DataLoader:
    """Threaded batch loader over a dataset + batch sampler.

    ``num_workers`` threads run the per-sample decode+augment; one prefetch
    thread assembles and queues up to ``prefetch`` finished batches.
    """

    def __init__(
        self,
        dataset,
        batch_sampler: Iterable[List],
        charset: Charset,
        max_len: int,
        num_workers: int = 0,
        static_batch_size: Optional[int] = None,
        with_ctc: bool = False,
        prefetch: int = 2,
        drop_invalid: bool = True,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.charset = charset
        self.max_len = max_len
        self.num_workers = max(0, num_workers)
        self.static_batch_size = static_batch_size
        self.with_ctc = with_ctc
        self.prefetch = max(1, prefetch)
        self.drop_invalid = drop_invalid

    def __len__(self) -> int:
        return len(self.batch_sampler)  # type: ignore[arg-type]

    def _fetch(self, idx):
        try:
            return self.dataset[idx]
        except Exception:
            if self.drop_invalid:
                return None
            raise

    def _make_batch(self, indices, pool: Optional[ThreadPoolExecutor]):
        if pool is not None:
            items = list(pool.map(self._fetch, indices))
        else:
            items = [self._fetch(i) for i in indices]
        items = [it for it in items if it is not None]
        if not items:
            return None
        return collate_batch(
            items,
            self.charset,
            self.max_len,
            batch_size=self.static_batch_size,
            with_ctc=self.with_ctc,
        )

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        pool = ThreadPoolExecutor(self.num_workers) if self.num_workers > 0 else None
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that notices a vanished consumer (early break)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for indices in self.batch_sampler:
                    if stop.is_set():
                        return
                    batch = self._make_batch(indices, pool)
                    if batch is not None and not put(batch):
                        return
            finally:
                put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is sentinel:
                    break
                yield batch
        finally:
            stop.set()
            thread.join(timeout=2.0)
            if pool is not None:
                pool.shutdown(wait=False)


def bucket_for_width(width: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= width (the largest bucket when none fits)."""
    for b in sorted(buckets):
        if width <= b:
            return int(b)
    return int(max(buckets))


def assign_width_buckets(
    sizes: Sequence,  # (h, w) per image
    img_h: int,
    buckets: Sequence[int],
) -> List[int]:
    """Pick the padded width bucket for each image after height-normalizing.

    Width bucketing is this framework's variable-length strategy
    (SURVEY.md §5.7): a handful of static widths means XLA compiles once
    per bucket and right-pad waste shrinks versus one global ``img_w``.
    """
    out = []
    for h, w in sizes:
        scaled_w = max(1, int(round(w * (img_h / max(h, 1)))))
        out.append(bucket_for_width(scaled_w, buckets))
    return out
