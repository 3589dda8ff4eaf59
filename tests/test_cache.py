"""Disk transform cache (`rcnn_ocr_tpu.data.cache`)."""

import os

import numpy as np
import pytest

from rcnn_ocr_tpu.data import dataset as dataset_mod
from rcnn_ocr_tpu.data.cache import TransformCache
from rcnn_ocr_tpu.data.dataset import ConcatDataset, OCRDataset
from rcnn_ocr_tpu.data.loader import DataLoader
from rcnn_ocr_tpu.data.transforms import ResizeAndPad, get_train_transform
from rcnn_ocr_tpu.vocab.charset import Charset
from tests.helpers import make_synthetic_dataset, tiny_labels

TOKENS = ["<PAD>", "<SOS>", "<EOS>", " "] + list("abcdefghij")


@pytest.fixture()
def charset():
    return Charset.from_tokens(TOKENS)


def _dataset(tmp_path, charset, name="d", n=8, transform=None):
    csv_path, root = make_synthetic_dataset(str(tmp_path / name), tiny_labels(n))
    return OCRDataset(
        csv_path, root, charset.stoi, img_height=32, img_max_width=64,
        transform=transform, verbose=False,
    )


def _count_decodes(monkeypatch):
    calls = {"n": 0}
    real = dataset_mod.imread_cv2

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(dataset_mod, "imread_cv2", counting)
    return calls


def test_cache_round_trip_serves_memmap_rows(tmp_path, charset, monkeypatch):
    tf = ResizeAndPad(img_h=32, img_w=64)
    ds = _dataset(tmp_path, charset, transform=tf)
    calls = _count_decodes(monkeypatch)
    cache = TransformCache(ds, tf, str(tmp_path / "cache"))
    assert cache.enabled

    first = [cache.fetch(i, lambda i=i: ds[i]) for i in range(len(ds))]
    decoded_after_fill = calls["n"]
    assert decoded_after_fill == len(ds)
    assert cache.hits() == len(ds)

    second = [cache.fetch(i, lambda i=i: ds[i]) for i in range(len(ds))]
    assert calls["n"] == decoded_after_fill  # zero decodes on hits
    for (img1, lab1), (img2, lab2) in zip(first, second):
        np.testing.assert_array_equal(img1, img2)
        assert lab1 == lab2

    # a fresh cache object over the same directory reuses the rows
    cache2 = TransformCache(ds, tf, str(tmp_path / "cache"))
    img, lab = cache2.fetch(0, lambda: (_ for _ in ()).throw(AssertionError("miss")))
    np.testing.assert_array_equal(img, first[0][0])
    assert lab == first[0][1]


def test_cache_loader_integration_identical_batches(tmp_path, charset, monkeypatch):
    tf = ResizeAndPad(img_h=32, img_w=64)
    ds = _dataset(tmp_path, charset, transform=tf)
    calls = _count_decodes(monkeypatch)

    class _Sampler:
        def __iter__(self):
            return iter([[0, 1, 2, 3], [4, 5, 6, 7]])

        def __len__(self):
            return 2

    loader = DataLoader(
        ds, _Sampler(), charset, max_len=6, static_batch_size=4,
        cache_dir=str(tmp_path / "cache"),
    )
    epoch1 = [b for b in loader]
    n_decodes = calls["n"]
    assert n_decodes == len(ds)
    epoch2 = [b for b in loader]
    assert calls["n"] == n_decodes  # epoch 2 is pure memmap reads
    for b1, b2 in zip(epoch1, epoch2):
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["target_y"], b2["target_y"])

    # uncached loader produces the same batches (cache is transparent)
    plain = DataLoader(ds, _Sampler(), charset, max_len=6, static_batch_size=4)
    for b1, b3 in zip(epoch1, plain):
        np.testing.assert_array_equal(b1["image"], b3["image"])


def test_cache_random_transform_never_caches(tmp_path, charset):
    tf = get_train_transform({}, img_h=32, img_w=64)  # random augs: no cache_key
    ds = _dataset(tmp_path, charset, transform=tf)
    cache_dir = tmp_path / "cache"
    loader = DataLoader(
        ds,
        [[0, 1, 2, 3]],
        charset,
        max_len=6,
        static_batch_size=4,
        cache_dir=str(cache_dir),
    )
    _ = [b for b in loader]
    assert not os.path.exists(cache_dir) or not os.listdir(cache_dir)


def test_cache_content_signature_invalidation(tmp_path, charset):
    tf = ResizeAndPad(img_h=32, img_w=64)
    ds = _dataset(tmp_path, charset, name="a", transform=tf)
    cache_dir = str(tmp_path / "cache")
    c1 = TransformCache(ds, tf, cache_dir)
    c1.fetch(0, lambda: ds[0])
    dirs1 = set(os.listdir(cache_dir))

    # a different dataset content -> a different cache directory
    ds2 = _dataset(tmp_path, charset, name="b", n=9, transform=tf)
    c2 = TransformCache(ds2, tf, cache_dir)
    c2.fetch(0, lambda: ds2[0])
    dirs2 = set(os.listdir(cache_dir))
    assert dirs1 < dirs2  # old cache kept, new digest added


def test_cache_quarantine_substitution_stays_uncached(tmp_path, charset):
    tf = ResizeAndPad(img_h=32, img_w=64)
    ds = _dataset(tmp_path, charset, transform=tf)
    # corrupt sample 0's file AFTER validation so the lazy recovery kicks in
    with open(ds.samples[0][0], "wb") as f:
        f.write(b"not an image")
    cache = TransformCache(ds, tf, str(tmp_path / "cache"))
    img, label = cache.fetch(0, lambda: ds[0])
    # the substitute pair is valid data, but index 0 must not be cached
    # with a mismatched label
    assert label in [lab for _, lab in ds.samples]
    if label != ds.sample_label(0):
        assert cache.hits() == 0
    # other rows still cache normally
    cache.fetch(1, lambda: ds[1])
    assert cache.hits() >= 1 or label == ds.sample_label(0)


def test_concat_shared_transform_property(tmp_path, charset):
    tf = ResizeAndPad(img_h=32, img_w=64)
    a = _dataset(tmp_path, charset, name="ca", transform=tf)
    b = _dataset(tmp_path, charset, name="cb", transform=tf)
    assert ConcatDataset([a, b]).transform is tf
    b.transform = ResizeAndPad(img_h=32, img_w=64)
    assert ConcatDataset([a, b]).transform is None
