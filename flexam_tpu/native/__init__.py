"""Native host-runtime ops (C++, ctypes-bound).

Builds `ops.cpp` on first import with g++ (cached .so next to the source);
every entry point has a numpy fallback so the package works without a
toolchain. See ops.cpp for the reference components these replace.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libflexam_native.so")
_SRC = os.path.join(_DIR, "ops.cpp")

_lib: Optional[ctypes.CDLL] = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.paint_frames.argtypes = [
            ctypes.c_int32] * 4 + [
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ]
        lib.knn.argtypes = [ctypes.c_int32] * 4 + [
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        lib.extract_patches.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        _lib = lib
        return lib
    except Exception as e:  # no toolchain / build failure -> numpy paths
        print(f"flexam_native unavailable ({e}); using numpy fallbacks")
        return None


def available() -> bool:
    return _build() is not None


def paint_frames(t: int, h: int, w: int, half: int, offsets: np.ndarray,
                 xy: np.ndarray, depth: np.ndarray,
                 rgb: np.ndarray) -> Optional[np.ndarray]:
    """Returns [T, H, W, 3] uint8 or None if the native lib is missing."""
    lib = _build()
    if lib is None:
        return None
    out = np.zeros((t, h, w, 3), np.uint8)
    lib.paint_frames(t, h, w, half,
                     np.ascontiguousarray(offsets, np.int64),
                     np.ascontiguousarray(xy, np.int32),
                     np.ascontiguousarray(depth, np.float32),
                     np.ascontiguousarray(rgb, np.uint8), out)
    return out


def knn(query: np.ndarray, ref: np.ndarray,
        k: int) -> Tuple[np.ndarray, np.ndarray]:
    """k nearest neighbors: (idx [N,K] int32, sq-dist [N,K] fp32)."""
    q = np.ascontiguousarray(query, np.float32)
    r = np.ascontiguousarray(ref, np.float32)
    n, d = q.shape
    m = r.shape[0]
    lib = _build()
    if lib is not None:
        idx = np.zeros((n, k), np.int32)
        dist = np.zeros((n, k), np.float32)
        lib.knn(n, m, d, k, q, r, idx, dist)
        return idx, dist
    # numpy fallback
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k].astype(np.int32)
    return idx, np.take_along_axis(d2, idx, 1).astype(np.float32)


def extract_patches(feat: np.ndarray, centers: np.ndarray, ph: int,
                    pw: int) -> np.ndarray:
    """feat [C,H,W], centers [N,2] (y,x) -> [N,C,ph,pw], zero-padded."""
    f = np.ascontiguousarray(feat, np.float32)
    c, h, w = f.shape
    cen = np.ascontiguousarray(centers, np.int32)
    n = cen.shape[0]
    lib = _build()
    if lib is not None:
        out = np.zeros((n, c, ph, pw), np.float32)
        lib.extract_patches(f, c, h, w, cen, n, ph, pw, out)
        return out
    out = np.zeros((n, c, ph, pw), np.float32)
    hy, hx = ph // 2, pw // 2
    for i in range(n):
        cy, cx = int(cen[i, 0]), int(cen[i, 1])
        y0, y1 = max(cy - hy, 0), min(cy - hy + ph, h)
        x0, x1 = max(cx - hx, 0), min(cx - hx + pw, w)
        oy, ox = y0 - (cy - hy), x0 - (cx - hx)
        out[i, :, oy:oy + y1 - y0, ox:ox + x1 - x0] = f[:, y0:y1, x0:x1]
    return out
