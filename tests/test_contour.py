"""Contour tracing tests: geometry checks + native/python agreement."""

import numpy as np
import pytest

from vaeplay_tpu.ops import contour as C


def circle_mask(n=64, cx=32, cy=30, r=20):
    yy, xx = np.mgrid[0:n, 0:n]
    return (((xx - cx) ** 2 + (yy - cy) ** 2) <= r * r).astype(np.float32)


def rect_mask(n=32, x0=8, y0=10, x1=24, y1=20):
    m = np.zeros((n, n), np.float32)
    m[y0:y1, x0:x1] = 1.0
    return m


def test_find_contour_circle_geometry():
    m = circle_mask()
    cnt = C.find_contour(m)
    assert len(cnt) > 40
    # all points within ~1.5px of the true radius
    d = np.sqrt((cnt[:, 0] - 32.0) ** 2 + (cnt[:, 1] - 30.0) ** 2)
    assert np.all(np.abs(d - 20.0) < 2.0)
    # consecutive points are adjacent (ordered contour, not a point soup)
    steps = np.linalg.norm(np.diff(cnt, axis=0), axis=1)
    assert steps.max() <= 2.0


def test_find_contour_rect_geometry():
    cnt = C.find_contour(rect_mask())
    assert len(cnt) > 0
    assert cnt[:, 0].min() >= 7 and cnt[:, 0].max() <= 24
    assert cnt[:, 1].min() >= 9 and cnt[:, 1].max() <= 20


def test_largest_contour_selected():
    m = circle_mask()  # big circle
    m[2:6, 2:6] = 1.0  # plus a small blob
    cnt = C.find_contour(m)
    d = np.sqrt((cnt[:, 0] - 32.0) ** 2 + (cnt[:, 1] - 30.0) ** 2)
    assert np.all(d > 5.0)  # none of the blob's points


def test_empty_mask():
    cnt = C.find_contour(np.zeros((16, 16), np.float32))
    assert cnt.shape == (0, 2)


def test_resample_points_reference_formula():
    contour = np.arange(600).reshape(300, 2)
    out = C.resample_points(contour, max_points=100)
    assert len(out) == 100
    # endpoints kept (tools/utils.py:117)
    np.testing.assert_array_equal(out[0], contour[0])
    np.testing.assert_array_equal(out[-1], contour[-1])
    # reference selection math
    step = (300 - 2) / (100 - 2)
    sel = np.round(np.arange(1, 99) * step, decimals=1).astype(np.int32)
    np.testing.assert_array_equal(out[1:-1], contour[sel])
    # short contours pass through
    short = np.arange(20).reshape(10, 2)
    np.testing.assert_array_equal(C.resample_points(short, 100), short)


def test_native_and_python_agree():
    if C._load_native() is None:
        pytest.skip("native lib unavailable")
    for m in (circle_mask(), rect_mask(), circle_mask(48, 24, 24, 10)):
        native = C.find_contour(m)
        # force python fallback
        lib, C._LIB = C._LIB, None
        try:
            py = C.find_contour(m)
        finally:
            C._LIB = lib
        assert len(native) == len(py), (len(native), len(py))
        # same point set (ordering/start may differ between traversals)
        sn = {tuple(p) for p in native.tolist()}
        sp = {tuple(p) for p in py.tolist()}
        assert sn == sp


def test_batch_find_contours():
    masks = np.stack([circle_mask(), np.zeros((64, 64), np.float32)])
    pts, counts = C.batch_find_contours(masks, max_points=64)
    assert pts.shape == (2, 64, 2)
    assert counts[0] == 64  # decimated to cap
    assert counts[1] == 0
    assert np.all(pts[1] == 0)
