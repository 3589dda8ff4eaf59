"""Width bucketing: header size probe, bucketed sampler, loader, training.

SURVEY.md §5.7 — the variable-length strategy: a handful of static padded
widths instead of one global ``img_w``, one XLA compilation per bucket.
"""

import os

import cv2
import numpy as np
import pytest

from rcnn_ocr_tpu.data.dataset import OCRDataset
from rcnn_ocr_tpu.data.loader import (
    BucketedBatchSampler,
    DataLoader,
    assign_width_buckets,
    probe_dataset_buckets,
)
from rcnn_ocr_tpu.data.transforms import get_val_transform, image_size
from tests.helpers import render_text_image


def _write(path, img):
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def test_image_size_header_parse(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(37, 211, 3), dtype=np.uint8)
    for ext in (".png", ".jpg", ".bmp"):
        p = str(tmp_path / f"probe{ext}")
        _write(p, img)
        assert image_size(p) == (37, 211), ext


def test_image_size_matches_decode(tmp_path):
    # cross-check the header parse against a full decode on odd sizes
    for h, w in [(1, 1), (480, 640), (31, 333)]:
        p = str(tmp_path / f"x_{h}_{w}.png")
        _write(p, np.zeros((h, w, 3), dtype=np.uint8))
        assert image_size(p) == (h, w)


def test_assign_width_buckets_scaling():
    buckets = [64, 128, 256]
    # 32x100 at img_h=32 -> width 100 -> bucket 128
    # 64x100 at img_h=32 -> width 50  -> bucket 64
    # 32x999 -> overflow -> largest bucket
    out = assign_width_buckets([(32, 100), (64, 100), (32, 999)], 32, buckets)
    assert out == [128, 64, 256]


def test_bucketed_sampler_single_bucket_batches():
    bucket_of = [64] * 10 + [128] * 5 + [256] * 3
    sampler = BucketedBatchSampler(bucket_of, batch_size=4, seed=0)
    seen = []
    for batch in sampler:
        widths = {bucket_of[i] for i in batch}
        assert len(widths) == 1  # never mixes buckets
        assert batch.width == widths.pop()  # explicit tag matches members
        seen.extend(batch)
    assert sorted(seen) == list(range(18))  # full coverage, no repeats
    assert len(sampler) == 3 + 2 + 1


@pytest.fixture()
def variable_width_ds(tmp_path, tiny_charset):
    import csv

    root = str(tmp_path / "vw")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    rows = []
    widths = [40, 90, 90, 200, 200, 200, 40, 90]
    for i, w in enumerate(widths):
        img = render_text_image("abc", h=24, w=w, rng=rng)
        fname = f"s{i}.png"
        _write(os.path.join(root, fname), img)
        rows.append([fname, "abc"])
    csv_path = os.path.join(root, "labels.csv")
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    ds = OCRDataset(csv_path, root, tiny_charset.stoi, verbose=False)
    return ds, tiny_charset


def test_bucketed_loader_shapes(variable_width_ds):
    ds, charset = variable_width_ds
    buckets = [64, 128, 256]
    bucket_of = probe_dataset_buckets(ds, img_h=32, buckets=buckets)
    # h=24 images scale by 32/24: w=40 -> 53 -> 64; 90 -> 120 -> 128; 200 -> 267 -> 256
    assert sorted(set(bucket_of)) == [64, 128, 256]

    sampler = BucketedBatchSampler(bucket_of, batch_size=2, seed=0)
    loader = DataLoader(
        ds, sampler, charset, max_len=6, num_workers=2, static_batch_size=2,
        bucket_of=bucket_of, transform_for_width=lambda w: get_val_transform(32, w),
    )
    shapes = set()
    n_images = 0
    for batch in loader:
        assert batch["image"].shape[1] == 32
        shapes.add(batch["image"].shape[1:3])
        n_images += int(batch["valid"].sum())
    assert n_images == len(ds)
    assert len(shapes) <= len(buckets)  # one static shape per bucket
    assert (32, 64) in shapes and (32, 128) in shapes and (32, 256) in shapes


@pytest.mark.slow
def test_training_with_width_buckets(tmp_path, tiny_charset):
    """run_training honors width_buckets: finishes, and the jit cache holds
    at most one compilation per bucket."""
    import csv

    from rcnn_ocr_tpu.training.config import Config
    from rcnn_ocr_tpu.training.train import run_training

    root = str(tmp_path / "bk")
    os.makedirs(root)
    rng = np.random.default_rng(1)
    rows = []
    for i in range(24):
        w = [40, 120][i % 2]
        label = "ab" if i % 2 else "cd"
        img = render_text_image(label, h=24, w=w, rng=rng)
        fname = f"t{i}.png"
        _write(os.path.join(root, fname), img)
        rows.append([fname, label])
    csv_path = os.path.join(root, "labels.csv")
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    charset_path = str(tmp_path / "charset.txt")
    with open(charset_path, "w", encoding="utf-8") as f:
        f.write("\n".join(["<PAD>", "<SOS>", "<EOS>"] + list("abcdefghij")) + "\n")

    exp_dir = str(tmp_path / "exp_buckets")
    cfg = Config({
        "train_csvs": [csv_path], "train_roots": [root],
        "charset_path": charset_path, "exp_dir": exp_dir,
        "img_h": 32, "img_w": 192, "width_buckets": [64, 192],
        "max_len": 6, "hidden_size": 32, "width_mult": 0.125,
        "batch_size": 4, "epochs": 1, "val_size": 8, "seed": 0,
        "compute_dtype": "float32", "use_pallas": False,
        "num_workers": 2, "progress": False,
    })
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])
    log = open(os.path.join(exp_dir, "train.log"), encoding="utf-8").read()
    assert "Width buckets" in log
    import re

    m = re.search(r"train_step compilations: (\d+)", log)
    assert m is not None
    assert int(m.group(1)) <= 2  # at most one compile per bucket


def test_optimal_width_buckets_dp():
    """The DP picks the waste-minimizing ≤k partition (checked against
    brute force over all contiguous partitions) and rounds to multiples."""
    import itertools

    from rcnn_ocr_tpu.data.loader import optimal_width_buckets

    rng = np.random.default_rng(0)

    def brute(widths, k, multiple, max_width):
        def up(w):
            x = ((max(int(w), 1) + multiple - 1) // multiple) * multiple
            return min(x, max_width) if max_width else x

        widths = [min(max(1, int(w)), max_width) if max_width else int(w)
                  for w in widths]
        uniq = sorted(set(widths))
        best = None
        for g in range(1, k + 1):
            if g > len(uniq):
                break
            for cuts in itertools.combinations(range(1, len(uniq)), g - 1):
                parts, lo = [], 0
                for c in list(cuts) + [len(uniq)]:
                    parts.append(uniq[lo:c])
                    lo = c
                buckets = sorted({up(p[-1]) for p in parts})
                waste = 0
                for w in widths:
                    b = next((b for b in buckets if b >= w), buckets[-1])
                    waste += max(0, b - w)
                if best is None or waste < best:
                    best = waste
        return best

    for trial in range(6):
        widths = rng.integers(10, 120, size=20).tolist()
        k = int(rng.integers(1, 5))
        got = optimal_width_buckets(widths, k, multiple=8, max_width=128)
        assert len(got) <= k and all(b % 8 == 0 or b == 128 for b in got)
        waste = 0
        for w in widths:
            w = min(w, 128)
            b = next((b for b in got if b >= w), got[-1])
            waste += max(0, b - w)
        assert waste == brute(widths, k, 8, 128), (trial, widths, k, got)

    # degenerate: fewer unique widths than k
    assert optimal_width_buckets([30, 30, 50], 4, multiple=8) == [32, 56]


def test_training_with_auto_width_buckets(tmp_path, tiny_charset):
    """"width_buckets": K (an int) derives the buckets from the data."""
    import csv

    from rcnn_ocr_tpu.training.config import Config
    from rcnn_ocr_tpu.training.train import run_training

    root = str(tmp_path / "abk")
    os.makedirs(root)
    rng = np.random.default_rng(2)
    rows = []
    for i in range(24):
        w = [40, 150][i % 2]
        label = "ab" if i % 2 else "cd"
        img = render_text_image(label, h=32, w=w, rng=rng)
        fname = f"t{i}.png"
        _write(os.path.join(root, fname), img)
        rows.append([fname, label])
    csv_path = os.path.join(root, "labels.csv")
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    charset_path = str(tmp_path / "charset.txt")
    with open(charset_path, "w", encoding="utf-8") as f:
        f.write("\n".join(["<PAD>", "<SOS>", "<EOS>"] + list("abcdefghij")) + "\n")

    exp_dir = str(tmp_path / "exp_auto_buckets")
    cfg = Config({
        "train_csvs": [csv_path], "train_roots": [root],
        "charset_path": charset_path, "exp_dir": exp_dir,
        "img_h": 32, "img_w": 192, "width_buckets": 2,
        "max_len": 6, "hidden_size": 32, "width_mult": 0.125,
        "batch_size": 4, "epochs": 1, "val_size": 8, "seed": 0,
        "compute_dtype": "float32", "use_pallas": False,
        "num_workers": 2, "progress": False,
    })
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])
    log = open(os.path.join(exp_dir, "train.log"), encoding="utf-8").read()
    assert "width_buckets=auto(k=2)" in log
    # two distinct rendered widths -> two derived buckets, both mult-of-8
    import re

    m = re.search(r"auto\(k=2\) -> \[(\d+), (\d+)\]", log)
    assert m is not None, log
    assert all(int(b) % 8 == 0 for b in m.groups())


class _LenOnly:
    """Sampler-facing dataset stub (samplers only need __len__)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def test_bucketed_proportional_sampler_quotas():
    """quota_mode="batch": per-batch dataset quotas hold exactly while every
    batch is single-bucket (VERDICT r2 #2: buckets + proportional mixing
    compose, reference per-batch contract)."""
    from collections import Counter

    from rcnn_ocr_tpu.data.loader import BucketedProportionalBatchSampler

    bucket_a = [64] * 30 + [128] * 10  # ds0: mostly short lines
    bucket_b = [128] * 20  # ds1: long lines only — no 64 pool
    sampler = BucketedProportionalBatchSampler(
        [_LenOnly(40), _LenOnly(20)],
        batch_size=8,
        proportions=[0.5, 0.5],
        bucket_ofs=[bucket_a, bucket_b],
        seed=0,
        quota_mode="batch",
    )
    assert len(sampler) == min(40 // 4, 20 // 4)
    lookup = sampler.bucket_of
    widths_seen = set()
    for _ in range(10):  # several epochs so both buckets get drawn
        for batch in sampler:
            assert len(batch) == 8
            counts = Counter(d for d, _ in batch)
            assert counts[0] == 4 and counts[1] == 4  # exact quotas
            widths_seen.add(batch.width)
            for d, i in batch:
                native = lookup[(d, i)]
                if native != batch.width:
                    # borrowed fill-in is only legal when that dataset has
                    # no native pool in the batch's bucket
                    pool = [bucket_a, bucket_b][d]
                    assert batch.width not in set(pool)
    assert widths_seen == {64, 128}  # bucket mass visits every bucket


def test_bucketed_proportional_sampler_expected_mode():
    """quota_mode="expected" (default): no sample is EVER resized across
    buckets — every row is native to its batch's bucket — and the dataset
    mix converges to the requested proportions across the epoch."""
    from collections import Counter

    from rcnn_ocr_tpu.data.loader import BucketedProportionalBatchSampler

    bucket_a = [64] * 30 + [128] * 10  # ds0: mostly short lines
    bucket_b = [128] * 20  # ds1: long lines only — no 64 pool
    sampler = BucketedProportionalBatchSampler(
        [_LenOnly(40), _LenOnly(20)],
        batch_size=8,
        proportions=[0.5, 0.5],
        bucket_ofs=[bucket_a, bucket_b],
        seed=0,
    )
    assert sampler.quota_mode == "expected"
    lookup = sampler.bucket_of
    totals = Counter()
    n_rows = 0
    for _ in range(40):  # many epochs: law of large numbers on the mix
        for batch in sampler:
            assert len(batch) == 8
            for d, i in batch:
                # bucket-native ALWAYS: the whole point of expected mode
                assert lookup[(d, i)] == batch.width
                totals[d] += 1
                n_rows += 1
    # E[share of ds0] = 0.5 by the telescoping bucket-draw construction
    assert abs(totals[0] / n_rows - 0.5) < 0.05
    # the narrow bucket is served entirely by ds0 (ds1 has no 64 pool)
    only64 = [b for b in sampler if b.width == 64]
    assert only64 and all(d == 0 for batch in only64 for d, _ in batch)


def test_bucketed_proportional_sampler_pass_fairness():
    """Within one (dataset, bucket) pool a full pass is exhausted before any
    reshuffle repeats a sample."""
    from rcnn_ocr_tpu.data.loader import BucketedProportionalBatchSampler

    sampler = BucketedProportionalBatchSampler(
        [_LenOnly(12)], batch_size=4, proportions=[1.0],
        bucket_ofs=[[64] * 12], seed=3,
    )
    seen = []
    for batch in sampler:
        seen.extend(i for _, i in batch)
    assert sorted(seen) == list(range(12))  # one epoch == one fair pass


def test_multidataset_sample_path(variable_width_ds, tmp_path):
    from rcnn_ocr_tpu.data.dataset import MultiDataset

    ds, _ = variable_width_ds
    multi = MultiDataset([ds, ds])
    assert multi.sample_path((0, 2)) == ds.sample_path(2)
    assert multi.sample_path((1, 0)) == ds.sample_path(0)


def test_bucketed_proportional_loader_end_to_end(tmp_path, tiny_charset):
    """DataLoader + MultiDataset + BucketedProportionalBatchSampler: batches
    come out single-width, ≤ one static shape per bucket, quotas per batch."""
    import csv

    from rcnn_ocr_tpu.data.dataset import MultiDataset
    from rcnn_ocr_tpu.data.loader import (
        BucketedProportionalBatchSampler,
        probe_scaled_widths,
        bucket_for_width,
    )

    rng = np.random.default_rng(0)
    sets = []
    for d, widths in enumerate([[40] * 8, [120] * 8]):
        root = str(tmp_path / f"mix{d}")
        os.makedirs(root)
        rows = []
        for i, w in enumerate(widths):
            img = render_text_image("ab", h=24, w=w, rng=rng)
            fname = f"m{i}.png"
            _write(os.path.join(root, fname), img)
            rows.append([fname, "ab"])
        csv_path = os.path.join(root, "labels.csv")
        with open(csv_path, "w", newline="") as f:
            csv.writer(f).writerows(rows)
        sets.append(OCRDataset(csv_path, root, tiny_charset.stoi, verbose=False))

    buckets = [64, 192]
    bucket_ofs = [
        [bucket_for_width(w, buckets) for w in probe_scaled_widths(ds, 32)]
        for ds in sets
    ]
    sampler = BucketedProportionalBatchSampler(
        sets, batch_size=4, proportions=[0.5, 0.5], bucket_ofs=bucket_ofs, seed=0
    )
    loader = DataLoader(
        MultiDataset(sets), sampler, tiny_charset, max_len=6,
        num_workers=2, static_batch_size=4,
        bucket_of=sampler.bucket_of,
        transform_for_width=lambda w: get_val_transform(32, w),
    )
    shapes = set()
    n_batches = 0
    for batch in loader:
        shapes.add(batch["image"].shape[1:3])
        n_batches += 1
    assert n_batches == len(sampler) > 0
    assert shapes <= {(32, 64), (32, 192)}


@pytest.mark.slow
def test_training_proportional_with_width_buckets(tmp_path, tiny_charset):
    """run_training with train_proportions AND width_buckets: the r2 guard
    is gone, training finishes, and compilations stay ≤ one per bucket."""
    import csv
    import re

    from rcnn_ocr_tpu.training.config import Config
    from rcnn_ocr_tpu.training.train import run_training

    rng = np.random.default_rng(1)
    csvs, roots = [], []
    for d, (w, label) in enumerate([(40, "ab"), (120, "cd")]):
        root = str(tmp_path / f"prop{d}")
        os.makedirs(root)
        rows = []
        for i in range(16):
            img = render_text_image(label, h=24, w=w, rng=rng)
            fname = f"p{i}.png"
            _write(os.path.join(root, fname), img)
            rows.append([fname, label])
        csv_path = os.path.join(root, "labels.csv")
        with open(csv_path, "w", newline="") as f:
            csv.writer(f).writerows(rows)
        csvs.append(csv_path)
        roots.append(root)
    charset_path = str(tmp_path / "charset.txt")
    with open(charset_path, "w", encoding="utf-8") as f:
        f.write("\n".join(["<PAD>", "<SOS>", "<EOS>"] + list("abcdefghij")) + "\n")

    exp_dir = str(tmp_path / "exp_prop_buckets")
    cfg = Config({
        "train_csvs": csvs, "train_roots": roots,
        "train_proportions": [0.5, 0.5],
        "charset_path": charset_path, "exp_dir": exp_dir,
        "img_h": 32, "img_w": 192, "width_buckets": [64, 192],
        "max_len": 6, "hidden_size": 32, "width_mult": 0.125,
        "batch_size": 4, "epochs": 1, "val_size": 8, "seed": 0,
        "compute_dtype": "float32", "use_pallas": False,
        "num_workers": 2, "progress": False,
    })
    result = run_training(cfg)
    assert np.isfinite(result["val_loss"])
    log = open(os.path.join(exp_dir, "train.log"), encoding="utf-8").read()
    assert "Width buckets" in log
    assert "width_buckets ignored" not in log
    m = re.search(r"train_step compilations: (\d+)", log)
    assert m is not None
    assert int(m.group(1)) <= 2  # ≤ one compile per bucket


def test_lift_buckets_for_ctc(tiny_charset):
    """Dense labels are lifted into buckets whose T = W/8 fits the CTC
    alignment; short labels keep their geometric bucket."""
    from rcnn_ocr_tpu.data.loader import lift_buckets_for_ctc

    class _DS:
        def __init__(self, labels):
            self._labels = labels

        def __len__(self):
            return len(self._labels)

        def sample_label(self, i):
            return self._labels[i]

    buckets = [64, 128]
    # T=8 at W=64, T=16 at W=128
    ds = _DS([
        "abc",          # 3 frames -> stays at 64
        "abcdefghij",   # 10 frames -> needs W>=80 -> 128
        "aabb",         # 4 + 2 repeats = 6 frames -> stays at 64
        "aabbccddee",   # 10 + 5 repeats = 15 frames -> 128
    ])
    geo = [64, 64, 64, 64]
    lifted = lift_buckets_for_ctc(ds, geo, tiny_charset, max_len=25, buckets=buckets)
    assert lifted == [64, 128, 64, 128]
    # an already-wide geometric bucket is never lowered
    assert lift_buckets_for_ctc(ds, [128, 128, 128, 128], tiny_charset,
                                max_len=25, buckets=buckets) == [128] * 4


def test_bucket_batch_slices_keep_width(variable_width_ds):
    """Multi-host composition (VERDICT r2 #7 x #2): a process's row slice of
    a bucketed batch keeps the batch's width tag, so a non-lead process —
    whose first local row may be a borrowed sample native to ANOTHER bucket
    — still pads to the batch's static width."""
    from rcnn_ocr_tpu.data.loader import BucketBatch, ProcessShardedBatchSampler

    ds, charset = variable_width_ds
    buckets = [64, 128, 256]
    bucket_of = probe_dataset_buckets(ds, img_h=32, buckets=buckets)
    # widths [40,90,90,200,200,200,40,90] -> buckets [64,128,128,256,256,256,64,128]
    assert bucket_of[2] == 128 and bucket_of[0] == 64

    # a 64-wide batch whose process-1 slice LEADS with a 128-native row
    global_batch = BucketBatch(64, [0, 6, 2, 1])

    class _OneBatch:
        def __iter__(self):
            return iter([global_batch])

        def __len__(self):
            return 1

    for p in range(2):
        sliced = list(ProcessShardedBatchSampler(_OneBatch(), p, 2))
        assert len(sliced) == 1 and isinstance(sliced[0], BucketBatch)
        assert sliced[0].width == 64
        loader = DataLoader(
            ds, [sliced[0]], charset, max_len=6, num_workers=0,
            static_batch_size=2, bucket_of=bucket_of,
            transform_for_width=lambda w: get_val_transform(32, w),
        )
        (batch,) = list(loader)
        # process 1's slice is [2, 1] (both 128-native); first-row width
        # inference would pad to 128 — the explicit tag keeps it at 64
        assert batch["image"].shape[1:3] == (32, 64)
