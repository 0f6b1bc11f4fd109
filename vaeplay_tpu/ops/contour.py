"""Contour extraction — host-side module replacing skimage/cv2/rdp usage
(reference tools/utils.py:73-125, networks_BC.py:26-36).

Fast path: the C++ marching-squares tracer (native/contour.cpp) via ctypes,
auto-built on first use if g++ is available.  Fallback: a pure-python port of
the same algorithm (identical semantics, used when the shared library can't
be built).

All batched outputs use the fixed-capacity + validity convention
(SURVEY.md §7 "Ragged point sets"): (B, max_points, 2) float32 [x, y] plus a
(B,) count vector.
"""

import ctypes
import math
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(_NATIVE_DIR, "libvaeplay_contour.so")
    if not os.path.exists(path):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.vaeplay_find_largest_contour.restype = ctypes.c_int
        lib.vaeplay_find_largest_contour.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.vaeplay_batch_contours.restype = None
        lib.vaeplay_batch_contours.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


# ---------------------------------------------------------------------------
# pure-python marching squares (same algorithm as native/contour.cpp)

_SEG_TABLE = {
    1: [("left", "top")], 2: [("top", "right")], 3: [("left", "right")],
    4: [("right", "bottom")], 6: [("top", "bottom")], 7: [("left", "bottom")],
    8: [("bottom", "left")], 9: [("top", "bottom")], 11: [("bottom", "right")],
    12: [("right", "left")], 13: [("top", "right")], 14: [("left", "top")],
}


def _py_trace(img: np.ndarray, level: float) -> List[np.ndarray]:
    h, w = img.shape
    inside = img >= level
    segs: List[Tuple[Tuple[float, float], Tuple[float, float]]] = []

    def interp(a, b):
        d = b - a
        if abs(d) < 1e-12:
            return 0.5
        return min(max((level - a) / d, 0.0), 1.0)

    rs, cs = np.nonzero(
        inside[:-1, :-1] | inside[:-1, 1:] | inside[1:, :-1] | inside[1:, 1:]
    )
    for r, c in zip(rs.tolist(), cs.tolist()):
        tl, tr = img[r, c], img[r, c + 1]
        bl, br = img[r + 1, c], img[r + 1, c + 1]
        idx = ((tl >= level) * 1 + (tr >= level) * 2
               + (br >= level) * 4 + (bl >= level) * 8)
        if idx in (0, 15):
            continue
        pts = {
            "top": (float(r), c + interp(tl, tr)),
            "right": (r + interp(tr, br), float(c + 1)),
            "bottom": (float(r + 1), c + interp(bl, br)),
            "left": (r + interp(tl, bl), float(c)),
        }
        if idx in (5, 10):
            center = (tl + tr + br + bl) / 4.0
            if idx == 5:
                pairs = ([("left", "bottom"), ("top", "right")] if center >= level
                         else [("left", "top"), ("right", "bottom")])
            else:
                pairs = ([("left", "top"), ("right", "bottom")] if center >= level
                         else [("left", "bottom"), ("top", "right")])
        else:
            pairs = _SEG_TABLE[idx]
        for a, b in pairs:
            segs.append((pts[a], pts[b]))

    # link
    def key(p):
        return (round(p[0] * 1000), round(p[1] * 1000))

    adj = {}
    for i, (a, b) in enumerate(segs):
        adj.setdefault(key(a), []).append((i, 0))
        adj.setdefault(key(b), []).append((i, 1))
    used = [False] * len(segs)
    paths = []
    for s in range(len(segs)):
        if used[s]:
            continue
        used[s] = True
        path = [segs[s][0], segs[s][1]]
        for direction in (0, 1):
            while True:
                tip = path[-1] if direction == 0 else path[0]
                found = False
                for si, end in adj.get(key(tip), []):
                    if used[si]:
                        continue
                    used[si] = True
                    nxt = segs[si][1 - end]
                    if direction == 0:
                        path.append(nxt)
                    else:
                        path.insert(0, nxt)
                    found = True
                    break
                if not found:
                    break
        paths.append(np.asarray(path))
    return paths


def _shoelace_abs(p: np.ndarray) -> float:
    x, y = p[:, 1], p[:, 0]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))) / 2.0


def _round_half_even(v: float) -> int:
    f = math.floor(v)
    d = v - f
    if d < 0.5:
        return int(f)
    if d > 0.5:
        return int(f) + 1
    return int(f) if int(f) % 2 == 0 else int(f) + 1


def find_contour(mask_img: np.ndarray, level: float = 0.8) -> np.ndarray:
    """Largest contour of a (binary) mask as [x, y] int points — reference
    tools/utils.py:73-109 semantics (round → dedupe → drop closing point →
    flip axes)."""
    lib = _load_native()
    mask_img = np.ascontiguousarray(mask_img, np.float32)
    h, w = mask_img.shape
    if lib is not None:
        cap = h * w
        out = np.empty((cap, 2), np.float32)
        n = lib.vaeplay_find_largest_contour(
            mask_img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, ctypes.c_float(level), cap,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out[:n].astype(np.int64) if n else np.empty((0, 2), np.int64)
    paths = _py_trace(mask_img, level)
    paths = [p for p in paths if len(p) >= 2]
    if not paths:
        return np.empty((0, 2), np.int64)
    contour = max(paths, key=_shoelace_abs)
    proc = []
    for r, c in contour:
        item = (_round_half_even(float(r)), _round_half_even(float(c)))
        if proc and proc[-1] == item:
            continue
        proc.append(item)
    if proc:
        proc.pop()  # closing point == start (tools/utils.py:98-99)
    if not proc:
        return np.empty((0, 2), np.int64)
    arr = np.asarray(proc, np.int64)
    return np.flip(arr, axis=1).copy()  # to [x, y]


def resample_points(contour: np.ndarray, max_points: int = 256) -> np.ndarray:
    """Uniform decimation keeping endpoints (reference tools/utils.py:111-125)."""
    l = len(contour)
    if l > max_points:
        step = (l - 2) / (max_points - 2)
        select = np.arange(1, max_points - 1) * step
        select = np.round(select, decimals=1)
        select = np.concatenate([[0], select, [l - 1]], axis=0).astype(np.int32)
        return np.asarray(contour[select])
    return contour


def rdp_simplify(points: np.ndarray, epsilon: float = 4.0) -> np.ndarray:
    """Ramer–Douglas–Peucker polyline simplification — replaces the `rdp`
    package used for key-contour extraction (reference datasets/dataset.py:253,
    epsilon=4).  Iterative implementation; points (N, D>=2), distance on the
    first two columns."""
    n = len(points)
    if n < 3:
        return np.asarray(points)
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    xy = np.asarray(points[:, :2], np.float64)
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        a, b = xy[s], xy[e]
        d = b - a
        norm = np.hypot(d[0], d[1])
        seg = xy[s + 1 : e]
        if norm < 1e-12:
            dist = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            dist = np.abs(d[0] * (a[1] - seg[:, 1]) - d[1] * (a[0] - seg[:, 0])) / norm
        imax = int(np.argmax(dist))
        if dist[imax] > epsilon:
            idx = s + 1 + imax
            keep[idx] = True
            stack.append((s, idx))
            stack.append((idx, e))
    return np.asarray(points[keep])


def batch_find_contours(
    masks: np.ndarray,  # (B, H, W) probabilities/binaries
    max_points: int = 256,
    threshold: float = 0.5,
    level: float = 0.8,
) -> Tuple[np.ndarray, np.ndarray]:
    """find_tensor_contour equivalent (networks_BC.py:26-36), batched with
    fixed-capacity padding.  Returns (pts (B, max_points, 2) float32 [x, y],
    counts (B,) int32)."""
    masks = np.ascontiguousarray(masks, np.float32)
    b, h, w = masks.shape
    lib = _load_native()
    if lib is not None:
        out = np.zeros((b, max_points, 2), np.float32)
        counts = np.zeros((b,), np.int32)
        lib.vaeplay_batch_contours(
            masks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b, h, w, ctypes.c_float(threshold), ctypes.c_float(level),
            max_points,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out, counts
    out = np.zeros((b, max_points, 2), np.float32)
    counts = np.zeros((b,), np.int32)
    for i in range(b):
        binary = (masks[i] >= threshold).astype(np.float32)
        cnt = find_contour(binary, level)
        cnt = resample_points(cnt, max_points)
        n = min(len(cnt), max_points)
        if n:
            out[i, :n] = cnt[:n]
        counts[i] = n
    return out, counts
