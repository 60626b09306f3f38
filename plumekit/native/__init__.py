"""Native (C++) host runtime: fast CCL + region stats via ctypes.

Auto-builds ``libplumekit_native.so`` on first use (g++ is assumed; the
image has no pybind11, so the library exposes a plain C ABI). Every entry
point has a scipy fallback, so the package works without a compiler too.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        from plumekit.native.build import build

        lib = ctypes.CDLL(build())
    except Exception:
        return None
    lib.plumekit_ccl_label.restype = ctypes.c_int32
    lib.plumekit_ccl_label.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.plumekit_region_stats.restype = None
    lib.plumekit_region_stats.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
    ]
    lib.plumekit_component_sizes.restype = None
    lib.plumekit_component_sizes.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def ccl_label(mask: np.ndarray, connectivity: int = 2
              ) -> Tuple[np.ndarray, int]:
    """Two-pass union-find CCL. Returns (labels 1..n int32, n). Falls back
    to ``scipy.ndimage.label`` when the native library is unavailable."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    lib = _load()
    if lib is None:
        from scipy import ndimage

        structure = np.ones((3, 3)) if connectivity == 2 else None
        labels, n = ndimage.label(mask, structure=structure)
        return labels.astype(np.int32), int(n)
    h, w = mask.shape
    out = np.empty((h, w), np.int32)
    n = lib.plumekit_ccl_label(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        connectivity, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, int(n)


def region_stats(labels: np.ndarray, n_labels: int):
    """(areas int64[n], bboxes int32[n,4] half-open, centroids float64[n,2])
    for labels 1..n_labels."""
    labels = np.ascontiguousarray(labels.astype(np.int32))
    h, w = labels.shape
    lib = _load()
    areas = np.zeros(n_labels, np.int64)
    bboxes = np.zeros((n_labels, 4), np.int32)
    centroids = np.zeros((n_labels, 2), np.float64)
    if lib is None:
        for i in range(1, n_labels + 1):
            ys, xs = np.nonzero(labels == i)
            if ys.size:
                areas[i - 1] = ys.size
                bboxes[i - 1] = (ys.min(), xs.min(), ys.max() + 1, xs.max() + 1)
                centroids[i - 1] = (ys.mean(), xs.mean())
            else:
                bboxes[i - 1] = (h, w, 0, 0)
        return areas, bboxes, centroids
    lib.plumekit_region_stats(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
        n_labels,
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return areas, bboxes, centroids


def component_sizes(labels: np.ndarray, n_labels: int) -> np.ndarray:
    """Sizes addressed by label value; slot 0 = background count."""
    labels = np.ascontiguousarray(labels.astype(np.int32))
    lib = _load()
    if lib is None:
        return np.bincount(
            labels.ravel(), minlength=n_labels + 1
        )[: n_labels + 1].astype(np.int64)
    sizes = np.zeros(n_labels + 1, np.int64)
    lib.plumekit_component_sizes(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.size, n_labels,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return sizes
