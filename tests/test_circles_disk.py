"""CDataset disk-mode parity: filename-encoded write + load round-trip
(reference dataset.py:35-48,57-58) and BCDataset debug truncation."""

import numpy as np

from vaeplay_tpu.data.circles import (
    CircleDataset, DiskCircleDataset, render_circle_np, write_circle_dataset)


def test_disk_circle_roundtrip(tmp_path):
    ds = CircleDataset(n=64, min_radius=8, data_size=6, seed=1)
    n = write_circle_dataset(str(tmp_path), ds)
    assert n == 6
    dd = DiskCircleDataset(str(tmp_path), 64)
    assert len(dd) == 6
    imgs, params = next(dd.epoch_batches(4))
    assert imgs.shape == (4, 64, 64, 1)
    assert params.shape == (4, 3)
    # each loaded image matches a fresh render of its filename params
    for img, (r, x, y) in zip(imgs, params):
        np.testing.assert_allclose(img, render_circle_np(64, x, y, r), atol=1e-2)
    # filename params round-trip exactly (integers)
    got = {tuple(p) for p in params.astype(int).tolist()}
    want = {tuple(p) for p in ds.params.astype(int).tolist()}
    assert got <= want


def test_disk_circle_downscales_larger_images(tmp_path):
    ds = CircleDataset(n=64, min_radius=8, data_size=2, seed=2)
    write_circle_dataset(str(tmp_path), ds)
    dd = DiskCircleDataset(str(tmp_path), 32)  # n smaller than stored 64
    imgs, _ = next(dd.epoch_batches(2))
    assert imgs.shape == (2, 32, 32, 1)


def test_bc_dataset_debug_truncation(tmp_path):
    """BCDataset(debug=N) stops the scan at N samples (dataset.py:228-233)."""
    import os

    from PIL import Image

    cls = tmp_path / "1"
    os.makedirs(cls)
    blank = Image.fromarray(np.zeros((16, 16, 3), np.uint8))
    for i in range(5):
        for suffix in ("", "_edge", "_mask", "_mask_edge"):
            blank.save(cls / f"s{i}{suffix}.png")
    from vaeplay_tpu.data.bc_data import BCDataset

    full = BCDataset(str(tmp_path), (16, 16), max_points=8)
    assert len(full) == 5
    cut = BCDataset(str(tmp_path), (16, 16), max_points=8, debug=2)
    assert len(cut) == 2
