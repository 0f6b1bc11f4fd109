"""Input-pipeline tests: prefetch wrapper + pooled parallel sample loading
(vaeplay_tpu/data/prefetch.py — the reference's DataLoader(num_workers)
equivalent, e.g. train_BE.py:115-121)."""

import time

import numpy as np
import pytest

from vaeplay_tpu.data.prefetch import (
    batched_loads, epoch_iterator, pooled_items, prefetch)


def test_prefetch_preserves_order_and_values():
    src = [{"i": np.full((4,), i)} for i in range(17)]
    out = list(prefetch(iter(src), depth=3))
    assert len(out) == 17
    for i, b in enumerate(out):
        assert np.array_equal(b["i"], np.full((4,), i))


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)
    # after the error the iterator is finished
    with pytest.raises(StopIteration):
        next(it)


def test_prefetch_close_unblocks_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=1)
    assert next(it) == 0
    it.close()
    time.sleep(0.3)  # producer should notice the stop event and exit
    assert len(produced) < 1000


def test_prefetch_actually_overlaps():
    """While the consumer sleeps, the producer should fill the queue."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=4)
    next(it)
    time.sleep(0.3)
    assert len(produced) == 4  # all items produced in the background
    assert list(it) == [1, 2, 3]


@pytest.mark.parametrize("workers", [0, 3])
def test_pooled_items_order(workers):
    def load(i):
        if workers:
            time.sleep(0.002 * (7 - i % 8))  # jumble completion order
        return i * 10

    assert list(pooled_items(load, range(25), workers)) == [i * 10 for i in range(25)]


def test_batched_loads_grouping_and_remainder():
    got = list(batched_loads(lambda i: i, list(range(10)), 4, workers=2))
    assert got == [[0, 1, 2, 3], [4, 5, 6, 7]]
    got = list(batched_loads(lambda i: i, list(range(10)), 4, workers=2,
                             drop_remainder=False))
    assert got == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]


def test_be_dataset_workers_identical(tmp_path):
    """BEDataset batches are byte-identical with and without worker threads."""
    from PIL import Image

    from vaeplay_tpu.data.be_data import BEDataset

    cls = tmp_path / "1"
    cls.mkdir()
    rng = np.random.default_rng(0)
    for k in range(9):
        Image.fromarray(rng.integers(0, 255, (24, 24, 3), np.uint8)).save(
            cls / f"s{k}.png")
        Image.fromarray(rng.integers(0, 255, (24, 24, 3), np.uint8)).save(
            cls / f"s{k}_layer.png")

    ds = BEDataset(str(tmp_path), (16, 16))
    seq = list(ds.epoch_batches(4, seed=3, workers=0))
    par = list(ds.epoch_batches(4, seed=3, workers=4))
    assert len(seq) == len(par) == 2
    for a, b in zip(seq, par):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_epoch_iterator_forwards_workers_when_supported():
    class WithWorkers:
        def epoch_batches(self, bs, seed, workers=0):
            yield {"bs": bs, "seed": seed, "workers": workers}

    class WithoutWorkers:
        def epoch_batches(self, bs, seed):
            yield {"bs": bs, "seed": seed}

    (b,) = list(epoch_iterator(WithWorkers(), 8, 5, workers=3))
    assert b == {"bs": 8, "seed": 5, "workers": 3}
    (b,) = list(epoch_iterator(WithoutWorkers(), 8, 5, workers=3))
    assert b == {"bs": 8, "seed": 5}


def test_synthetic_epoch_iterator_matches_plain():
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset

    ds = SyntheticBubbleDataset(img_size=16, data_size=12)
    plain = list(ds.epoch_batches(4, 2))
    wrapped = list(epoch_iterator(ds, 4, 2, workers=2))
    assert len(plain) == len(wrapped) == 3
    for a, b in zip(plain, wrapped):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
