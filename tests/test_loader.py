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


def test_loader_producer_exception_surfaces(tmp_path):
    """A crash in the producer thread must raise in the consumer, not
    masquerade as a normally finished (truncated/empty) epoch."""
    from rcnn_ocr_tpu.data.loader import DataLoader
    from rcnn_ocr_tpu.vocab.charset import Charset

    class _BoomSampler:
        def __iter__(self):
            raise RuntimeError("sampler exploded")
            yield  # pragma: no cover

        def __len__(self):
            return 1

    charset = Charset.from_tokens(["<PAD>", "<SOS>", "<EOS>", "a"])
    loader = DataLoader(
        dataset=None, batch_sampler=_BoomSampler(), charset=charset,
        max_len=4, num_workers=0,
    )
    with pytest.raises(RuntimeError, match="sampler exploded"):
        list(iter(loader))


def test_process_sharded_sampler_carries_remainder_rows():
    """len(batch) % P rows used to be silently DROPPED from every partial
    batch (excluded from validation metrics); they now carry into the
    next same-width batch, and the union over processes covers every
    placeable row (round-4 review)."""
    from rcnn_ocr_tpu.data.loader import BucketBatch, ProcessShardedBatchSampler

    class _S:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

    # plain batches: 33 rows then 32 rows, P=2 -> all 65 placeable rows
    # minus at most P-1 leftovers are served exactly once
    batches = [list(range(33)), list(range(33, 65))]
    outs = {
        p: [list(b) for b in ProcessShardedBatchSampler(_S(batches), p, 2)]
        for p in range(2)
    }
    served = [r for p in range(2) for b in outs[p] for r in b]
    assert len(served) == len(set(served))  # no duplicates
    assert len(served) >= 65 - 1  # at most P-1 rows unplaceable
    # lockstep: both processes emit the same number of batches with equal
    # per-batch sizes
    assert [len(b) for b in outs[0]] == [len(b) for b in outs[1]]

    # bucketed batches carry PER WIDTH (widths never mix)
    bb = [
        BucketBatch(64, list(range(5))),
        BucketBatch(128, list(range(100, 107))),
        BucketBatch(64, list(range(5, 10))),
    ]
    outs_b = {
        p: list(ProcessShardedBatchSampler(_S(bb), p, 2)) for p in range(2)
    }
    for p in range(2):
        for b in outs_b[p]:
            assert isinstance(b, BucketBatch)
            lo = 100 if b.width == 128 else 0
            hi = 107 if b.width == 128 else 10
            assert all(lo <= r < hi for r in b.indices)
    served_b = [r for p in range(2) for b in outs_b[p] for r in b]
    assert len(served_b) == len(set(served_b))
    assert len(served_b) >= 17 - 2  # at most P-1 leftovers PER WIDTH
