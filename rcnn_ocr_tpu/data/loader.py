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
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from rcnn_ocr_tpu.vocab.charset import Charset, pack_attention_targets, pack_ctc_targets


class BucketBatch:
    """A batch index list tagged with its static padded width.

    Bucketed samplers yield these so every consumer — including a
    process-sharded slice of the batch on a multi-host run, which may not
    hold the batch's first global row — knows the batch's width without
    inferring it from any particular member row.
    """

    __slots__ = ("width", "indices")

    def __init__(self, width: int, indices: List):
        self.width = int(width)
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __iter__(self):
        return iter(self.indices)

    def __getitem__(self, key):
        # slicing keeps the width tag (ProcessShardedBatchSampler carves
        # per-process row blocks out of a global batch)
        if isinstance(key, slice):
            return BucketBatch(self.width, self.indices[key])
        return self.indices[key]


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
    images = np.stack(imgs)
    if images.dtype != np.uint8:  # uint8 passes through for on-device augment
        images = images.astype(np.float32)
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
        bucket_of: Optional[Sequence[int]] = None,
        transform_for_width: Optional[callable] = None,
        cache_dir: Optional[str] = None,
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
        # width bucketing: bucketed samplers yield BucketBatch (explicit
        # width per batch); bucket_of[i] = padded width for dataset index i
        # remains the fallback for plain index-list batches;
        # transform_for_width(w) builds the per-bucket resize transform
        # (memoized — one transform object per distinct bucket width)
        self.bucket_of = bucket_of
        self._transform_cache: dict = {}
        self._transform_for_width = transform_for_width
        if (bucket_of is None) != (transform_for_width is None):
            raise ValueError(
                "bucket_of and transform_for_width must be given together"
            )
        # disk-backed transform cache (rcnn_ocr_tpu.data.cache): one per
        # effective deterministic transform; decode+resize happen once per
        # sample per cache lifetime, later epochs read memmap rows
        self.cache_dir = cache_dir
        self._disk_caches: dict = {}

    def _disk_cache(self, transform):
        if self.cache_dir is None:
            return None
        eff = transform if transform is not None else getattr(
            self.dataset, "transform", None
        )
        key = getattr(eff, "cache_key", None)
        if eff is None or key is None:
            return None
        if key not in self._disk_caches:
            from rcnn_ocr_tpu.data.cache import TransformCache

            self._disk_caches[key] = TransformCache(self.dataset, eff, self.cache_dir)
        return self._disk_caches[key]

    def __len__(self) -> int:
        return len(self.batch_sampler)  # type: ignore[arg-type]

    def _bucket_transform(self, width: int):
        if width not in self._transform_cache:
            self._transform_cache[width] = self._transform_for_width(width)
        return self._transform_cache[width]

    def _fetch(self, idx, transform=None):
        def fetch_fn():
            if transform is not None:
                return self.dataset.fetch(idx, transform=transform)
            return self.dataset[idx]

        try:
            cache = self._disk_cache(transform)
            if cache is not None:
                return cache.fetch(idx, fetch_fn)
            return fetch_fn()
        except Exception:
            if self.drop_invalid:
                return None
            raise

    def _make_batch(self, indices, pool: Optional[ThreadPoolExecutor]):
        transform = None
        if isinstance(indices, BucketBatch):
            # bucketed samplers tag each batch with its width explicitly
            transform = self._bucket_transform(indices.width)
            indices = indices.indices
        elif self.bucket_of is not None:
            # legacy single-bucket batches: width from the first member row
            width = self.bucket_of[indices[0]]
            transform = self._bucket_transform(width)
        if pool is not None:
            items = list(pool.map(lambda i: self._fetch(i, transform), indices))
        else:
            items = [self._fetch(i, transform) for i in indices]
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

        # a producer crash must SURFACE in the consumer, not masquerade as
        # a normally finished epoch (the sentinel alone would let training
        # continue on silently truncated/empty epochs)
        producer_error: List[BaseException] = []

        def producer():
            try:
                for indices in self.batch_sampler:
                    if stop.is_set():
                        return
                    batch = self._make_batch(indices, pool)
                    if batch is not None and not put(batch):
                        return
            except BaseException as e:
                producer_error.append(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is sentinel:
                    if producer_error:
                        raise producer_error[0]
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


def scaled_width(h: int, w: int, img_h: int) -> int:
    """Width of an (h, w) image after height-normalizing to ``img_h``.

    THE bucketing width formula: every bucket-assignment site (training
    samplers, eval CLI, inference engine) must round identically, or the
    same image can land in different buckets on different paths.
    """
    return max(1, int(round(w * (img_h / max(h, 1)))))


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
    return [bucket_for_width(scaled_width(h, w, img_h), buckets) for h, w in sizes]


def optimal_width_buckets(
    scaled_widths: Sequence[int],
    k: int,
    multiple: int = 8,
    max_width: Optional[int] = None,
) -> List[int]:
    """Choose ≤ ``k`` static bucket widths minimizing total right-pad waste.

    TPU-native auto-bucketing: given the height-normalized widths of the
    actual data, pick the padded widths (rounded up to ``multiple`` — the
    backbone's W/8 time axis wants multiples of 8) that minimize
    ``sum_i(bucket(w_i) − w_i)``.  Exact DP over the sorted unique widths:
    partition them into ≤ k contiguous groups, each padded to its
    maximum.  O(U²·k) with prefix sums for U unique widths.

    ``max_width`` clamps every width first (images wider than the model's
    maximum always pad/crop there anyway).
    """

    def up(w: int) -> int:
        return ((max(int(w), 1) + multiple - 1) // multiple) * multiple

    widths = [max(1, int(w)) for w in scaled_widths]
    if max_width is not None:
        widths = [min(w, int(max_width)) for w in widths]
    if not widths or k <= 0:
        raise ValueError("need at least one width and k >= 1")

    uniq = sorted(set(widths))
    counts = [widths.count(u) for u in uniq]
    u = len(uniq)
    if u <= k:
        return [up(x) for x in uniq]

    # prefix sums for O(1) group cost: images in group (i..j] pad to up(uniq[j])
    pref_n = [0] * (u + 1)
    pref_wsum = [0] * (u + 1)
    for i in range(u):
        pref_n[i + 1] = pref_n[i] + counts[i]
        pref_wsum[i + 1] = pref_wsum[i] + counts[i] * uniq[i]

    def cost(i: int, j: int) -> int:  # group covers uniq[i..j] inclusive
        n = pref_n[j + 1] - pref_n[i]
        return up(uniq[j]) * n - (pref_wsum[j + 1] - pref_wsum[i])

    INF = float("inf")
    dp = [[INF] * u for _ in range(k + 1)]
    cut = [[-1] * u for _ in range(k + 1)]
    for j in range(u):
        dp[1][j] = cost(0, j)
    for g in range(2, k + 1):
        for j in range(g - 1, u):
            for m in range(g - 2, j):
                c = dp[g - 1][m] + cost(m + 1, j)
                if c < dp[g][j]:
                    dp[g][j] = c
                    cut[g][j] = m
    # backtrack the best ≤ k partition of all U widths
    best_g = min(range(1, k + 1), key=lambda g: dp[g][u - 1])
    bounds = []
    g, j = best_g, u - 1
    while g >= 1:
        bounds.append(j)
        j = cut[g][j]
        g -= 1
    buckets = {up(uniq[b]) for b in bounds}
    if max_width is not None:
        # rounding-up must not push a bucket past the model's maximum
        buckets = {min(b, int(max_width)) for b in buckets}
    return sorted(buckets)


def probe_scaled_widths(dataset, img_h: int, num_workers: int = 8) -> List[int]:
    """Height-normalized width of every sample (header probe, no decode)."""
    from concurrent.futures import ThreadPoolExecutor

    from rcnn_ocr_tpu.data.transforms import image_size

    paths = [dataset.sample_path(i) for i in range(len(dataset))]
    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        sizes = list(pool.map(image_size, paths))
    return [scaled_width(h, w, img_h) for h, w in sizes]


def lift_buckets_for_ctc(
    dataset,
    bucket_of: Sequence[int],
    charset,
    max_len: int,
    buckets: Sequence[int],
    time_downsample: int = 8,
) -> List[int]:
    """Raise each sample's width bucket until its CTC label fits.

    A CTC alignment needs ``len(label) + adjacent_repeats`` time steps; the
    backbone yields ``W / time_downsample`` of them (RCNN: T = W/8).  Pure
    geometry bucketing can drop a dense line into a bucket too short to
    align — CTC then assigns the pair zero probability (optax charges
    ~1e5), poisoning training loss AND making the label undecodable at
    inference.  Labels are known at training/eval time, so the bucket
    choice lifts to the smallest bucket whose time axis fits (the widest
    bucket when none does — `ops/ctc.py:ctc_loss` masks those rows).
    """
    blank = charset.ctc_blank_id
    out = list(bucket_of)
    for i in range(len(dataset)):
        ids = [
            t
            for t in charset.encode(dataset.sample_label(i), drop_blank=True)
            if t != blank
        ][:max_len]
        reps = sum(a == b for a, b in zip(ids, ids[1:]))
        need_w = (len(ids) + reps) * time_downsample
        if need_w > out[i]:
            out[i] = bucket_for_width(need_w, buckets)
    return out


def probe_dataset_buckets(
    dataset,
    img_h: int,
    buckets: Sequence[int],
    num_workers: int = 8,
) -> List[int]:
    """Header-probe every sample's size and assign its width bucket.

    Uses :func:`rcnn_ocr_tpu.data.transforms.image_size` (no pixel decode)
    over the dataset's ``sample_path`` view, threaded — a one-time indexing
    pass, ~microseconds per file.  Composes the two probing primitives so
    there is ONE header-probe implementation to maintain.
    """
    scaled = probe_scaled_widths(dataset, img_h, num_workers=num_workers)
    return [bucket_for_width(w, buckets) for w in scaled]


class ProcessShardedBatchSampler:
    """Per-process view of a replicated global batch sampler (multi-host DP).

    Every process builds the SAME underlying sampler (identical seed), so
    the global batch sequence is common knowledge; this wrapper keeps only
    the contiguous row block that maps to this process's addressable
    devices under the data-axis sharding (process ``p`` of ``P`` gets rows
    ``[p*B/P, (p+1)*B/P)`` of each global batch).  Feed the local rows
    through :func:`rcnn_ocr_tpu.parallel.mesh.make_process_local_batch`.

    Width-bucketed samplers compose transparently: they yield
    :class:`BucketBatch` objects whose slice operator preserves the width
    tag, so every process's row block carries the batch's static padded
    width regardless of which global rows it holds.
    """

    def __init__(self, sampler, process_index: int, process_count: int):
        if not (0 <= process_index < process_count):
            raise ValueError("process_index out of range")
        self.sampler = sampler
        self.pidx = process_index
        self.pcount = process_count

    @staticmethod
    def _parts(batch):
        """(width tag or None, row list) of a global batch."""
        if isinstance(batch, BucketBatch):
            return batch.width, list(batch.indices)
        return None, list(batch)

    def _emit(self, width, rows):
        local = rows[self.pidx * (len(rows) // self.pcount):
                     (self.pidx + 1) * (len(rows) // self.pcount)]
        return BucketBatch(width, local) if width is not None else local

    def __iter__(self):
        # rows a P-way split cannot place (len % P) CARRY into the next
        # same-width batch instead of being dropped: dropping them
        # silently excluded up to P-1 rows of EVERY partial batch from
        # validation metrics (and training epochs).  The carry is keyed by
        # the batch's static width so bucketed batches never mix widths;
        # every process computes the identical carry (replicated
        # samplers), so collectives stay in lockstep.  At epoch end at
        # most P-1 rows per width remain unplaceable.
        carries: dict = {}
        for batch in self.sampler:
            width, rows = self._parts(batch)
            rows = carries.pop(width, []) + rows
            placeable = (len(rows) // self.pcount) * self.pcount
            if placeable == 0:
                carries[width] = rows
                continue
            carries[width] = rows[placeable:]
            yield self._emit(width, rows[:placeable])
        for width, rows in carries.items():
            placeable = (len(rows) // self.pcount) * self.pcount
            if placeable:
                yield self._emit(width, rows[:placeable])

    def __len__(self) -> int:
        # advisory (progress bars): the carry can add one flush batch per
        # width at epoch end
        return len(self.sampler)  # type: ignore[arg-type]


class BucketedProportionalBatchSampler:
    """Proportional multi-dataset mixing where every batch is single-bucket.

    Composes the two sequence-scaling features the reference keeps separate
    (`/root/reference/data/dataset.py:299-334` fixed-width proportional
    sampler; SURVEY.md §5.7 width bucketing): every batch's samples ALL
    share one static padded width (XLA compiles at most ``len(buckets)``
    train-step shapes) while dataset mixing follows ``proportions`` under
    one of two quota modes:

    * ``quota_mode="expected"`` (default): each batch's per-dataset counts
      are apportioned by that dataset's mass IN THE DRAWN BUCKET
      (``count_d ∝ prop_d · |pool[d][b]| / |dataset_d|``), so no sample is
      ever resized across buckets, and over the epoch
      ``E[samples from d] = batch_size · prop_d`` exactly (the bucket draw
      ``P(b) ∝ Σ_d prop_d · m_db`` makes the per-bucket weights telescope).
      Measured the better trainer: the per-batch-exact mode squashes
      borrowed wide lines into narrow buckets — scale = min of both axis
      ratios, so they lose vertical resolution too — which costs real
      training loss (PERF.md round 3).
    * ``quota_mode="batch"``: the reference sampler's per-batch contract —
      exactly ``round(batch_size * prop_d)`` samples from dataset ``d`` in
      EVERY batch; a dataset with no samples in the drawn bucket fills its
      quota from its nearest non-empty bucket (the per-batch transform
      resizes those rows to the batch width).

    Mechanics shared by both modes:

    * one endless shuffled index stream per non-empty ``(dataset, bucket)``
      pool — every sample of a pool is seen once per pass before reshuffle;
    * each batch's bucket is drawn from the proportion-weighted bucket mass
      ``P(b) ∝ Σ_d prop_d · |pool[d][b]| / |dataset_d|`` — in expectation
      each dataset's internal width distribution is followed as closely as
      the single-bucket constraint allows;
    * every yield is a :class:`BucketBatch` carrying its padded width
      explicitly, so any slice of the batch (e.g. a non-lead process's row
      block under multi-host sharding) still knows the batch shape.

    Epoch length matches :class:`ProportionalBatchSampler` (min full passes
    over any proportioned dataset).
    """

    def __init__(
        self,
        datasets,
        batch_size: int,
        proportions,
        bucket_ofs: Sequence[Sequence[int]],  # per dataset: bucket width per sample
        seed: Optional[int] = None,
        quota_mode: str = "expected",
    ):
        if quota_mode not in ("expected", "batch"):
            raise ValueError(f"quota_mode must be 'expected' or 'batch', got {quota_mode!r}")
        if abs(sum(proportions) - 1.0) >= 1e-6:
            raise ValueError("proportions must sum to 1")
        if len(bucket_ofs) != len(datasets):
            raise ValueError("bucket_ofs must align with datasets")
        self.datasets = list(datasets)
        self.batch_size = batch_size
        self.proportions = list(proportions)
        self.quota_mode = quota_mode
        self._rng = np.random.default_rng(seed)
        # largest-remainder so the quotas sum EXACTLY to the static batch
        # (independent round() can sum past it — see dataset.exact_quotas)
        from rcnn_ocr_tpu.data.dataset import exact_quotas

        self._quotas = exact_quotas(batch_size, proportions)
        self.buckets = sorted({int(b) for bo in bucket_ofs for b in bo})

        self._pools: List[Dict[int, np.ndarray]] = []
        for bo in bucket_ofs:
            pools: Dict[int, np.ndarray] = {}
            arr = np.asarray(list(bo), dtype=np.int64)
            for b in self.buckets:
                members = np.nonzero(arr == b)[0]
                if len(members):
                    pools[b] = members
            self._pools.append(pools)

        # bucket chosen per batch ∝ proportion-weighted sample mass
        mass = np.array([
            sum(
                p * len(pools.get(b, ())) / max(1, len(ds))
                for p, pools, ds in zip(self.proportions, self._pools, self.datasets)
            )
            for b in self.buckets
        ])
        if mass.sum() <= 0:
            raise ValueError("no samples in any bucket")
        self._bucket_p = mass / mass.sum()

        self._streams: List[Dict[int, Iterator[int]]] = [
            {b: self._endless_shuffle(members) for b, members in pools.items()}
            for pools in self._pools
        ]
        # expected mode: per-bucket real-valued dataset counts
        # (``batch_size * prop_d * m_db / Σ_d' prop_d' * m_d'b``); each
        # batch rounds them stochastically (`_systematic_round`) so
        # E[count_d | bucket] is EXACT and the epoch-level dataset mix
        # telescopes to ``prop_d`` with no apportionment bias
        self._bucket_raw: Dict[int, np.ndarray] = {}
        if quota_mode == "expected":
            for b in self.buckets:
                weights = np.array([
                    p * len(pools.get(b, ())) / max(1, len(ds))
                    for p, pools, ds in zip(
                        self.proportions, self._pools, self.datasets
                    )
                ])
                if weights.sum() <= 0:
                    continue
                self._bucket_raw[b] = weights / weights.sum() * batch_size
        # natural bucket of every (ds, idx) — the loader's width lookup
        self.bucket_of: Dict[Tuple[int, int], int] = {
            (d, int(i)): int(b)
            for d, bo in enumerate(bucket_ofs)
            for i, b in enumerate(bo)
        }

    def _endless_shuffle(self, members: np.ndarray) -> Iterator[int]:
        while True:
            for i in self._rng.permutation(len(members)):
                yield int(members[i])

    def _nearest_pool(self, d: int, bucket: int) -> int:
        """Nearest non-empty bucket of dataset ``d`` (ties -> smaller)."""
        have = sorted(self._pools[d])
        return min(have, key=lambda b: (abs(b - bucket), b))

    def _systematic_round(self, raw: np.ndarray) -> np.ndarray:
        """Unbiased integer rounding of ``raw`` preserving its sum.

        floor() everything, then hand out the remaining slots by systematic
        sampling on the fractional parts (one uniform offset, points spaced
        1 apart over the cumulative remainders) — each dataset's inclusion
        probability is exactly its fractional part, so
        ``E[result] == raw`` element-wise.
        """
        base = np.floor(raw)
        rem = raw - base
        short = int(round(raw.sum() - base.sum()))
        if short > 0:
            pts = self._rng.uniform() + np.arange(short)
            hit = np.searchsorted(np.cumsum(rem), pts, side="right")
            base[np.minimum(hit, len(base) - 1)] += 1
        return base.astype(int)

    def __iter__(self):
        for _ in range(len(self)):
            bucket = int(
                self._rng.choice(np.asarray(self.buckets), p=self._bucket_p)
            )
            rows: List[Tuple[int, int]] = []
            quotas = (
                self._systematic_round(self._bucket_raw[bucket])
                if self.quota_mode == "expected"
                else self._quotas
            )
            for d, quota in enumerate(quotas):
                if quota <= 0:
                    continue
                # expected mode: counts are bucket-native by construction.
                # batch mode: quota fills from d's native pool in the drawn
                # bucket, or d's nearest non-empty bucket when it has none
                # there (the per-batch transform resizes borrowed rows to
                # the batch width — same geometry any fixed-width run
                # applies)
                stream = self._streams[d].get(bucket) or self._streams[d][
                    self._nearest_pool(d, bucket)
                ]
                rows.extend((d, next(stream)) for _ in range(quota))
            order = self._rng.permutation(len(rows))
            yield BucketBatch(bucket, [rows[i] for i in order])

    def __len__(self) -> int:
        return min(
            len(ds) // max(1, quota)
            for ds, quota, prop in zip(self.datasets, self._quotas, self.proportions)
            if prop > 0
        )


class BucketedBatchSampler:
    """Shuffled batching where every batch comes from ONE width bucket.

    ``bucket_of[i]`` is the bucket width of dataset index ``i``.  Each epoch
    shuffles within buckets, chunks each bucket into batches
    (drop-last=False), then shuffles the batch order across buckets — so
    XLA sees at most ``len(set(bucket_of))`` input shapes per mode while
    batch order stays stochastic.
    """

    def __init__(
        self,
        bucket_of: Sequence[int],
        batch_size: int,
        shuffle: bool = True,
        seed: Optional[int] = None,
    ):
        self.bucket_of = list(bucket_of)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._groups: Dict[int, np.ndarray] = {}
        for width in sorted(set(self.bucket_of)):
            members = [i for i, w in enumerate(self.bucket_of) if w == width]
            self._groups[width] = np.asarray(members, dtype=np.int64)

    def __iter__(self) -> Iterator[BucketBatch]:
        batches: List[BucketBatch] = []
        for width, members in self._groups.items():
            order = self._rng.permutation(len(members)) if self.shuffle else np.arange(len(members))
            shuffled = members[order]
            for i in range(0, len(shuffled), self.batch_size):
                batches.append(
                    BucketBatch(width, [int(j) for j in shuffled[i : i + self.batch_size]])
                )
        if self.shuffle:
            batches = [batches[i] for i in self._rng.permutation(len(batches))]
        return iter(batches)

    def __len__(self) -> int:
        return sum(
            (len(m) + self.batch_size - 1) // self.batch_size
            for m in self._groups.values()
        )
