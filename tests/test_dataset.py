import csv
import os

import numpy as np
import pytest

from rcnn_ocr_tpu.data.dataset import (
    ConcatDataset,
    MultiDataset,
    OCRDataset,
    ProportionalBatchSampler,
    ShuffleBatchSampler,
    random_split,
)
from tests.helpers import make_synthetic_dataset, tiny_labels


@pytest.fixture()
def synth(tmp_path, tiny_charset):
    labels = tiny_labels(20)
    csv_path, root = make_synthetic_dataset(str(tmp_path / "ds"), labels)
    return csv_path, root, labels, tiny_charset


def test_dataset_basic(synth):
    csv_path, root, labels, cs = synth
    ds = OCRDataset(csv_path, root, cs.stoi, verbose=False)
    assert len(ds) == len(labels)
    img, label = ds[0]
    assert img.ndim == 3 and img.shape[2] == 3  # HWC
    assert img.dtype == np.float32
    assert label == labels[0]  # executor.map keeps CSV order


def test_dataset_tsv_autodetect(tmp_path, tiny_charset):
    labels = tiny_labels(5)
    csv_path, root = make_synthetic_dataset(
        str(tmp_path / "t"), labels, delimiter="\t", csv_name="labels.tsv"
    )
    ds = OCRDataset(csv_path, root, tiny_charset.stoi, verbose=False)
    assert len(ds) == 5


def test_dataset_header_autodetect(tmp_path, tiny_charset):
    labels = tiny_labels(5)
    csv_path, root = make_synthetic_dataset(str(tmp_path / "h"), labels, header=True)
    ds = OCRDataset(csv_path, root, tiny_charset.stoi, verbose=False)
    assert len(ds) == 5


def test_dataset_skip_reasons(tmp_path, tiny_charset):
    labels = ["ab", "cd"]
    csv_path, root = make_synthetic_dataset(str(tmp_path / "s"), labels)
    # append bad rows: missing file, charset violation, too-long, empty label
    with open(csv_path, "a", newline="", encoding="utf-8") as f:
        wr = csv.writer(f)
        wr.writerow(["missing.png", "ab"])
        wr.writerow(["img_0000.png", "XYZ"])  # chars outside charset
        wr.writerow(["img_0000.png", "abcdefghij"])  # too long for max_len=4
        wr.writerow(["img_0000.png", ""])
        wr.writerow(["onlyonefield"])
    ds = OCRDataset(csv_path, root, tiny_charset.stoi, max_len=4, verbose=False)
    assert len(ds) == 2
    assert ds._reasons["missing_path"] == 1
    assert ds._reasons["charset"] == 1
    assert ds._reasons["too_long"] == 1
    assert ds._reasons["empty_label"] == 1
    assert ds._reasons["bad_row"] == 1
    assert ds._missing_chars["X"] == 1


def test_dataset_charset_nonstrict_keeps_rows(tmp_path, tiny_charset):
    labels = ["ab"]
    csv_path, root = make_synthetic_dataset(str(tmp_path / "n"), labels)
    with open(csv_path, "a", newline="", encoding="utf-8") as f:
        csv.writer(f).writerow(["img_0000.png", "Z9"])
    ds = OCRDataset(csv_path, root, tiny_charset.stoi, strict_charset=False, verbose=False)
    assert len(ds) == 2


def test_dataset_basename_fallback(tmp_path, tiny_charset):
    labels = ["ab"]
    csv_path, root = make_synthetic_dataset(str(tmp_path / "b"), labels)
    # move the image to a subdirectory; CSV references the bare name
    sub = os.path.join(root, "nested")
    os.makedirs(sub)
    os.rename(os.path.join(root, "img_0000.png"), os.path.join(sub, "img_0000.png"))
    ds = OCRDataset(csv_path, root, tiny_charset.stoi, verbose=False)
    assert len(ds) == 1
    assert ds.samples[0][0].endswith(os.path.join("nested", "img_0000.png"))


def test_dataset_lazy_bad_image_resample(synth):
    csv_path, root, labels, cs = synth
    ds = OCRDataset(csv_path, root, cs.stoi, verbose=False)
    # corrupt one file after indexing
    bad_path = ds.samples[3][0]
    with open(bad_path, "wb") as f:
        f.write(b"not an image")
    img, label = ds[3]  # must substitute a random valid sample
    assert img is not None
    assert ds._invalid_mask[3]
    assert ds._reasons["readfail"] == 1


def test_dataset_empty_raises(tmp_path, tiny_charset):
    p = tmp_path / "empty.csv"
    p.write_text("", encoding="utf-8")
    with pytest.raises(RuntimeError):
        OCRDataset(str(p), str(tmp_path), tiny_charset.stoi, verbose=False)


def test_random_split_transforms_independent(synth):
    csv_path, root, labels, cs = synth
    ds = OCRDataset(csv_path, root, cs.stoi, verbose=False)
    tr, va = random_split(ds, 15, 5, seed=0)
    marker = {"train": 0, "val": 0}

    def t_train(img, rng=None):
        marker["train"] += 1
        return img

    def t_val(img, rng=None):
        marker["val"] += 1
        return img

    tr.transform = t_train
    va.transform = t_val
    tr[0]
    va[0]
    assert marker == {"train": 1, "val": 1}
    # no index overlap
    assert set(tr.indices).isdisjoint(va.indices)


def test_proportional_sampler(synth, tmp_path, tiny_charset):
    csv_path, root, labels, cs = synth
    ds1 = OCRDataset(csv_path, root, cs.stoi, verbose=False)
    csv2, root2 = make_synthetic_dataset(str(tmp_path / "ds2"), tiny_labels(6, seed=1))
    ds2 = OCRDataset(csv2, root2, cs.stoi, verbose=False)

    sampler = ProportionalBatchSampler([ds1, ds2], batch_size=8, proportions=[0.5, 0.5], seed=0)
    batches = list(sampler)
    assert len(batches) == len(sampler)
    for batch in batches:
        assert len(batch) == 8
        counts = {0: 0, 1: 0}
        for ds_idx, _ in batch:
            counts[ds_idx] += 1
        assert counts == {0: 4, 1: 4}  # exact proportions, ds2 oversampled

    md = MultiDataset([ds1, ds2])
    img, label = md[batches[0][0]]
    assert img.ndim == 3


def test_shuffle_sampler_covers_all(synth):
    csv_path, root, labels, cs = synth
    ds = OCRDataset(csv_path, root, cs.stoi, verbose=False)
    sampler = ShuffleBatchSampler(ds, batch_size=6, seed=0)
    seen = [i for batch in sampler for i in batch]
    assert sorted(seen) == list(range(len(ds)))
    assert len(sampler) == 4  # ceil(20/6)


def test_concat_dataset(synth, tmp_path, tiny_charset):
    csv_path, root, labels, cs = synth
    ds1 = OCRDataset(csv_path, root, cs.stoi, verbose=False)
    csv2, root2 = make_synthetic_dataset(str(tmp_path / "c2"), tiny_labels(3, seed=2))
    ds2 = OCRDataset(csv2, root2, cs.stoi, verbose=False)
    cat = ConcatDataset([ds1, ds2])
    assert len(cat) == len(ds1) + len(ds2)
    _, last_label = cat[len(cat) - 1]
    assert last_label == ds2.samples[-1][1]


def test_exact_quotas_sum_to_batch():
    """Largest-remainder apportionment: quotas sum EXACTLY to batch_size
    (independent round() summed three 1/3 shares of 32 to 33, breaking
    the static-batch contract — round-4 review), each within 1 of the
    reference's rounding."""
    from rcnn_ocr_tpu.data.dataset import exact_quotas

    assert exact_quotas(32, [1 / 3, 1 / 3, 1 / 3]) == [11, 11, 10]
    assert exact_quotas(32, [0.5, 0.5]) == [16, 16]
    assert exact_quotas(8, [0.9, 0.1]) == [7, 1]
    assert exact_quotas(4, [0.26, 0.26, 0.26, 0.22]) == [1, 1, 1, 1]
    import random

    rng = random.Random(0)
    for _ in range(200):
        k = rng.randint(1, 6)
        raw = [rng.random() + 1e-9 for _ in range(k)]
        props = [p / sum(raw) for p in raw]
        bs = rng.randint(k, 64)
        q = exact_quotas(bs, props)
        assert sum(q) == bs
        assert all(abs(qi - bs * pi) < 1.0 + 1e-9 for qi, pi in zip(q, props))


def test_proportional_sampler_batches_never_exceed_batch_size(tmp_path):
    """Three 1/3 proportions at batch 32 used to yield 33-row batches."""
    from rcnn_ocr_tpu.data.dataset import ProportionalBatchSampler

    class _DS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

    sampler = ProportionalBatchSampler(
        [_DS(60), _DS(60), _DS(60)], batch_size=32,
        proportions=[1 / 3, 1 / 3, 1 / 3], seed=0,
    )
    batches = list(sampler)
    assert batches and all(len(b) == 32 for b in batches)
