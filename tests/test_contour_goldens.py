"""Hand-computed marching-squares golden cases (VERDICT round-1 item 7).

Semantics source: the reference traces with skimage.measure.find_contours at
level 0.8 then rounds, dedupes consecutive points, drops the closing point,
and flips to [x, y] (tools/utils.py:73-109).  For a binary mask, the level-0.8
crossing sits 0.8 of the way from each outside pixel toward its inside
neighbour, so every contour vertex rounds onto the INSIDE boundary pixel —
the goldens below are derived by hand from that rule, including both saddle
configurations (cell average 0.5 < 0.8 → diagonal pairs resolve as
DISCONNECTED).  Both the native C++ tracer and the python fallback must
reproduce them; any semantic drift fails loudly here.
"""

import numpy as np
import pytest

from vaeplay_tpu.ops import contour as C


def _cycle_key(pts):
    """Normalize a closed boundary sequence up to rotation + direction."""
    pts = [tuple(int(v) for v in p) for p in pts]
    best = None
    for seq in (pts, pts[::-1]):
        for s in range(len(seq)):
            cand = tuple(seq[s:] + seq[:s])
            if best is None or cand < best:
                best = cand
    return best


def _tracers(monkeypatch):
    """Yield (name, find_contour) for the native and pure-python tracers."""
    out = [("native-or-default", C.find_contour)]

    def py_only(mask, level=0.8):
        import unittest.mock as mock

        with mock.patch.object(C, "_load_native", lambda: None):
            return C.find_contour(mask, level)

    out.append(("python", py_only))
    return out


def _mask(rows, shape):
    m = np.zeros(shape, np.float32)
    for r, c in rows:
        m[r, c] = 1.0
    return m


CASES = [
    # (name, inside pixels (row, col), mask shape, expected [x, y] cycle)
    ("2x2 block",
     [(1, 1), (1, 2), (2, 1), (2, 2)], (4, 4),
     [(1, 1), (2, 1), (2, 2), (1, 2)]),
    ("3x2 block",
     [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3)], (5, 6),
     [(1, 1), (2, 1), (3, 1), (3, 2), (2, 2), (1, 2)]),
    # saddle case A: block + diagonal pixel sharing only a corner — the cell
    # average (0.5) is below the 0.8 level, so the diagonal DISCONNECTS and
    # the largest contour is the block alone
    ("block + saddle-diagonal pixel",
     [(1, 1), (1, 2), (2, 1), (2, 2), (3, 3)], (5, 5),
     [(1, 1), (2, 1), (2, 2), (1, 2)]),
    # largest-area selection between two blocks: the 3x3 wins, its rounded
    # trace is its 8-pixel boundary ring in traversal order
    ("largest of two blocks",
     [(1, 1), (1, 2), (2, 1), (2, 2),
      (5, 5), (5, 6), (5, 7), (6, 5), (6, 6), (6, 7), (7, 5), (7, 6), (7, 7)],
     (9, 9),
     [(5, 5), (6, 5), (7, 5), (7, 6), (7, 7), (6, 7), (5, 7), (5, 6)]),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_contour_goldens(case, monkeypatch):
    name, pixels, shape, expected = case
    mask = _mask(pixels, shape)
    for tracer_name, fc in _tracers(monkeypatch):
        got = fc(mask)
        assert len(got) == len(expected), (
            name, tracer_name, got.tolist(), expected)
        assert _cycle_key(got) == _cycle_key(expected), (
            name, tracer_name, got.tolist(), expected)


@pytest.mark.parametrize("pixels,shape", [
    # a single pixel's four crossings all round onto it; after consecutive
    # dedupe + closing-point drop the reference yields an EMPTY contour
    ([(2, 2)], (5, 5)),
    # saddle case B: two pixels sharing only a corner — both components are
    # single pixels, so the largest contour is also degenerate/empty
    ([(1, 1), (2, 2)], (4, 4)),
])
def test_contour_goldens_degenerate(pixels, shape, monkeypatch):
    mask = _mask(pixels, shape)
    for tracer_name, fc in _tracers(monkeypatch):
        got = fc(mask)
        assert len(got) == 0, (tracer_name, got.tolist())


def test_contour_matches_boundary_pixels_random(monkeypatch):
    """Property on random blobs: every traced point is an inside pixel that
    touches the outside (the rounding rule above), for both tracers."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        h = w = 24
        ys, xs = np.mgrid[0:h, 0:w]
        cx, cy = rng.uniform(8, 16, 2)
        rx, ry = rng.uniform(3, 6, 2)
        mask = ((((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2) <= 1.0
                ).astype(np.float32)
        inside = mask > 0
        pad = np.pad(inside, 1)
        touches_outside = ~(pad[:-2, 1:-1] & pad[2:, 1:-1]
                            & pad[1:-1, :-2] & pad[1:-1, 2:])
        boundary = inside & touches_outside
        for tracer_name, fc in _tracers(monkeypatch):
            got = fc(mask)
            assert len(got) > 0
            for x, y in got:
                assert boundary[int(y), int(x)], (tracer_name, x, y)
