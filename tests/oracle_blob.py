"""Clean-room scipy oracle for the skimage blob detectors.

The reference's ``plume_indetifier_blob.py:40-48`` calls skimage
``blob_log`` / ``blob_dog`` / ``blob_doh``; skimage is not installed here
(by design), so this restates the PUBLISHED algorithm (Lindeberg
scale-space blob detection as described in the skimage docs and the
original papers) in plain scipy:

* LoG: ``-gaussian_laplace(img, s) * s**2`` per scale (scale-normalised),
  scales an even ladder over [min_sigma, max_sigma].
* DoG: geometric ladder ``min_sigma * ratio**i``; response
  ``(G_i - G_{i+1}) / (ratio - 1)`` (≈ scale-normalised LoG).
* DoH: determinant of the Hessian of the smoothed image, ``* s**4``.
* Peaks: 26-neighbourhood local maxima of the (S, H, W) cube above an
  absolute threshold (plateau points all qualify, the maximum-filter
  convention).
* Pruning: pairwise circle-overlap (intersection area over the smaller
  circle's area) greater than ``overlap`` discards the smaller-sigma blob.
* Radii: ``r = σ·√2`` for LoG/DoG (reference ``:43,46``); DoH reports σ.

Boundary handling is scipy's default ``reflect`` — documented divergence
vs the device detectors' edge replication (docs/parity.md "blob
detectors"); fixtures keep blobs interior where the two agree.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def _cube_maxima(cube: np.ndarray, threshold: float) -> np.ndarray:
    """(S, H, W) bool: strictly-above-threshold 26-neighbourhood maxima
    (>= all neighbours, so plateaus qualify everywhere, matching the
    maximum-filter formulation)."""
    mx = ndimage.maximum_filter(cube, size=3, mode="nearest")
    return (cube >= mx) & (cube > threshold)


def _circle_overlap(r1, c1, rad1, r2, c2, rad2) -> float:
    """Intersection area of two discs over the SMALLER disc's area."""
    d = float(np.hypot(r1 - r2, c1 - c2))
    if d >= rad1 + rad2:
        return 0.0
    small, big = sorted((rad1, rad2))
    if d <= big - small:
        return 1.0
    # lens area via the standard two-segment formula
    a1 = np.arccos(np.clip((d * d + rad1**2 - rad2**2)
                           / (2 * d * rad1), -1, 1))
    a2 = np.arccos(np.clip((d * d + rad2**2 - rad1**2)
                           / (2 * d * rad2), -1, 1))
    lens = (rad1**2 * (a1 - np.sin(2 * a1) / 2)
            + rad2**2 * (a2 - np.sin(2 * a2) / 2))
    return float(lens / (np.pi * small**2))


def prune_overlapping(blobs: np.ndarray, overlap: float,
                      radius_scale: float) -> np.ndarray:
    """Discard the smaller-sigma member of every pair whose disc overlap
    exceeds ``overlap``. ``radius_scale`` maps the stored sigma column to
    the disc radius (√2 for LoG/DoG, 1 for DoH)."""
    blobs = np.array(blobs, np.float32, copy=True)
    alive = np.ones(len(blobs), bool)
    order = np.argsort(-blobs[:, 2])  # big sigmas first: they win ties
    for ii, i in enumerate(order):
        if not alive[i]:
            continue
        for j in order[ii + 1:]:
            if not alive[j]:
                continue
            if _circle_overlap(blobs[i, 0], blobs[i, 1],
                               blobs[i, 2] * radius_scale,
                               blobs[j, 0], blobs[j, 1],
                               blobs[j, 2] * radius_scale) > overlap:
                alive[j] = False
    return blobs[alive]


def _extract(cube, sigmas, threshold, overlap, radius_scale):
    ss, ys, xs = np.nonzero(_cube_maxima(cube, threshold))
    blobs = np.column_stack(
        [ys, xs, np.asarray(sigmas, np.float32)[ss]]).astype(np.float32)
    blobs = prune_overlapping(blobs, overlap, radius_scale)
    blobs[:, 2] *= radius_scale
    return blobs


def oracle_blob_log(image, min_sigma=1.0, max_sigma=50.0, num_sigma=10,
                    threshold=0.2, overlap=0.5) -> np.ndarray:
    img = np.asarray(image, np.float64)
    sigmas = np.linspace(min_sigma, max_sigma, num_sigma)
    cube = np.stack([-ndimage.gaussian_laplace(img, s) * s**2
                     for s in sigmas])
    return _extract(cube, sigmas, threshold, overlap, np.sqrt(2.0))


def oracle_blob_dog(image, min_sigma=1.0, max_sigma=50.0, sigma_ratio=1.6,
                    threshold=0.2, overlap=0.5) -> np.ndarray:
    img = np.asarray(image, np.float64)
    k = int(np.log(max_sigma / min_sigma) / np.log(sigma_ratio)) + 1
    sigmas = [min_sigma * sigma_ratio**i for i in range(k + 1)]
    gs = [ndimage.gaussian_filter(img, s) for s in sigmas]
    cube = np.stack([(gs[i] - gs[i + 1]) / (sigma_ratio - 1.0)
                     for i in range(k)])
    return _extract(cube, sigmas[:k], threshold, overlap, np.sqrt(2.0))


def oracle_blob_doh(image, min_sigma=1.0, max_sigma=30.0, num_sigma=10,
                    threshold=0.01, overlap=0.5) -> np.ndarray:
    img = np.asarray(image, np.float64)
    sigmas = np.linspace(min_sigma, max_sigma, num_sigma)
    outs = []
    for s in sigmas:
        b = ndimage.gaussian_filter(img, s)
        dyy = np.gradient(np.gradient(b, axis=0), axis=0)
        dxx = np.gradient(np.gradient(b, axis=1), axis=1)
        dxy = np.gradient(np.gradient(b, axis=0), axis=1)
        outs.append((dxx * dyy - dxy**2) * s**4)
    return _extract(np.stack(outs), sigmas, threshold, overlap, 1.0)
