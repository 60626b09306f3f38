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
        try:
            _register(lib)
        except AttributeError:
            # a prebuilt .so whose mtime beat every source (tarball /
            # rsync -t deploys) can predate newer entry points; rebuild
            # once rather than silently disabling EVERY native path
            lib = ctypes.CDLL(build(force=True))
            _register(lib)
    except Exception:
        return None
    _LIB = lib
    return lib


def _register(lib: ctypes.CDLL) -> None:
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
    lib.plumekit_quantize_uint16.restype = ctypes.c_int32
    lib.plumekit_quantize_uint16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.plumekit_quantize_mask_uint8.restype = None
    lib.plumekit_quantize_mask_uint8.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]


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


def quantize_uint16(channels: np.ndarray
                    ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Fused single-allocation affine uint16 encode over the LAST axis —
    the native half of :func:`plumekit.ops.quant.quantize_uint16`
    (bit-exact with the numpy path; see quant.cpp). Returns None when the
    library is unavailable (caller falls back to numpy); raises the
    codec's documented ValueError on non-finite input."""
    lib = _load()
    if lib is None:
        return None
    channels = np.ascontiguousarray(channels, dtype=np.float32)
    c = channels.shape[-1]
    q = np.empty(channels.shape, np.uint16)
    lo = np.empty(c, np.float32)
    scale = np.empty(c, np.float32)
    rc = lib.plumekit_quantize_uint16(
        channels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        channels.size // c, c,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        finite = np.isfinite(channels.reshape(-1, c))
        raise ValueError(
            "quantize_uint16 requires finite input; found NaN/inf "
            f"(channel finite counts: {finite.sum(axis=0)} "
            f"of {finite.shape[0]})")
    return q, lo, scale


def quantize_mask_uint8(mask: np.ndarray) -> Optional[np.ndarray]:
    """uint8 = rint(clip(mask, 0, 1) * 255) — the label-mask codec of
    ``train/data.quantize_samples``. None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.float32)
    out = np.empty(mask.shape, np.uint8)
    lib.plumekit_quantize_mask_uint8(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), mask.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


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
