"""Native (C++) host components, loaded via ctypes.

The reference leans on third-party native libraries (Concorde, OpenCV,
TurboJPEG — SURVEY.md §2.3); this package holds the framework's own C++
equivalents. Each binding degrades gracefully to a numpy implementation if
the shared library has not been built (``make -C acmpc_tpu/native``); an
automatic build is attempted once on first use.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libacmpc_native.so"
_lib = None
_build_attempted = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", str(_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.acmpc_tsp_tour.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_double,
    ]
    lib.acmpc_tsp_tour.restype = None
    _lib = lib
    return lib


def tsp_tour(points: np.ndarray, time_bound_s: float = 5.0) -> np.ndarray:
    """Order 2-D points into a closed tour (index array). C++ NN+2-opt when
    the native library is available, numpy NN+2-opt fallback otherwise."""
    points = np.ascontiguousarray(points[:, :2], np.float32)
    n = len(points)
    if n <= 2:
        return np.arange(n)
    lib = _load()
    if lib is not None:
        order = np.zeros(n, np.int32)
        lib.acmpc_tsp_tour(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            float(time_bound_s),
        )
        return order.astype(np.int64)
    return _tsp_tour_numpy(points, time_bound_s)


def _tsp_tour_numpy(points: np.ndarray, time_bound_s: float) -> np.ndarray:
    """Pure-numpy NN construction + vectorised 2-opt passes."""
    import time

    n = len(points)
    # nearest-neighbour construction
    remaining = np.arange(1, n)
    tour = [0]
    current = 0
    while len(remaining):
        d = np.linalg.norm(points[remaining] - points[current], axis=1)
        k = int(np.argmin(d))
        current = int(remaining[k])
        tour.append(current)
        remaining = np.delete(remaining, k)
    tour = np.asarray(tour)

    t_end = time.monotonic() + time_bound_s
    improved = True
    while improved and time.monotonic() < t_end:
        improved = False
        pts = points[tour]
        nxt = np.roll(pts, -1, axis=0)
        seg = np.linalg.norm(nxt - pts, axis=1)
        for i in range(n - 2):
            # vectorised scan of all j for this i
            j = np.arange(i + 2, n)
            d_new = np.linalg.norm(pts[j] - pts[i], axis=1) + np.linalg.norm(
                pts[(j + 1) % n] - pts[i + 1], axis=1
            )
            d_old = seg[i] + seg[j]
            delta = d_new - d_old
            k = int(np.argmin(delta))
            if delta[k] < -1e-9:
                jj = i + 2 + k
                tour[i + 1 : jj + 1] = tour[i + 1 : jj + 1][::-1]
                improved = True
                break
            if time.monotonic() >= t_end:
                break
    return tour
