import numpy as np
import pytest

from rcnn_ocr_tpu.data.dataset import OCRDataset, ShuffleBatchSampler
from rcnn_ocr_tpu.data.loader import (
    DataLoader,
    assign_width_buckets,
    bucket_for_width,
    collate_batch,
)
from tests.helpers import make_synthetic_dataset, tiny_labels


def test_collate_shapes(tiny_charset):
    items = [
        (np.zeros((32, 64, 3), np.float32), "ab"),
        (np.zeros((32, 64, 3), np.float32), "c"),
    ]
    batch = collate_batch(items, tiny_charset, max_len=5)
    assert batch["image"].shape == (2, 32, 64, 3)
    assert batch["text_in"].shape == (2, 6)
    assert batch["target_y"].shape == (2, 6)
    assert batch["valid"].all()


def test_collate_static_padding(tiny_charset):
    items = [(np.ones((8, 8, 3), np.float32), "a")]
    batch = collate_batch(items, tiny_charset, max_len=3, batch_size=4, with_ctc=True)
    assert batch["image"].shape == (4, 8, 8, 3)
    assert batch["valid"].tolist() == [True, False, False, False]
    assert batch["ctc_labels"].shape == (4, 3)
    assert len(batch["labels"]) == 4  # padded rows repeat real labels


def test_loader_iterates_all_batches(tmp_path, tiny_charset):
    csv_path, root = make_synthetic_dataset(str(tmp_path / "d"), tiny_labels(10))
    ds = OCRDataset(csv_path, root, tiny_charset.stoi, verbose=False)
    loader = DataLoader(
        ds,
        ShuffleBatchSampler(ds, 4, seed=0),
        tiny_charset,
        max_len=5,
        num_workers=2,
        static_batch_size=4,
    )
    batches = list(loader)
    assert len(batches) == 3
    assert sum(int(b["valid"].sum()) for b in batches) == 10
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 3) or b["image"].shape[0] == 4


def test_bucket_for_width():
    assert bucket_for_width(50, [64, 128, 256]) == 64
    assert bucket_for_width(64, [64, 128, 256]) == 64
    assert bucket_for_width(65, [64, 128, 256]) == 128
    assert bucket_for_width(999, [64, 128, 256]) == 256


def test_assign_width_buckets():
    # h=64,w=256 scaled to img_h=32 -> w'=128; h=32,w=100 -> 100 -> bucket 128
    got = assign_width_buckets([(64, 256), (32, 100), (32, 40)], 32, [64, 128, 256])
    assert got == [128, 128, 64]
