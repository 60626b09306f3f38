"""Blob-detector baseline (LoG / DoG / DoH) on device.

The reference's ``plume_indetifier_blob.py`` (typo is the repo's) compares
skimage ``blob_log``/``blob_dog``/``blob_doh`` on one hard-coded granule and
is broken as committed (``import src.features.tools`` never binds ``tools``,
SURVEY.md bug #1). Here the three detectors are implemented natively as
separable Gaussian pyramids + 3-D local-max extraction, jit-compiled; radii
follow the reference's ``r = σ·√2`` convention (``:43,46``).

This is an optional experiment path (SURVEY.md §3.5), not part of the core
identify API. Exactness vs the published algorithm is MEASURED (round 4):
one-to-one set equality — 0.00 px / 0.00 radius deltas on clean and noisy
multi-scale fixtures — against the clean-room scipy restatement in
``tests/oracle_blob.py`` (docs/parity.md "blob detectors").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from plumekit.config.identify import BlobIdentifyConfig


def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    r = max(int(truncate * sigma + 0.5), 1)
    x = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _gaussian_blur(img, sigma: float):
    """Separable blur with SYMMETRIC (scipy-'reflect') boundaries — edge
    replication let one noisy corner pixel masquerade as a large constant
    patch and fire max-sigma LoG/DoH responses at the image corners
    (measured against the scipy oracle, docs/parity.md)."""
    k = jnp.asarray(_gaussian_kernel(sigma))
    r = k.shape[0] // 2
    pad = jnp.pad(img, ((r, r), (0, 0)), mode="symmetric")
    img = lax.conv_general_dilated(
        pad[None, None], k[None, None, :, None], (1, 1), "VALID",
        precision=lax.Precision.HIGHEST,
    )[0, 0]
    pad = jnp.pad(img, ((0, 0), (r, r)), mode="symmetric")
    img = lax.conv_general_dilated(
        pad[None, None], k[None, None, None, :], (1, 1), "VALID",
        precision=lax.Precision.HIGHEST,
    )[0, 0]
    return img


def _shift(img, dr: int, dc: int):
    """``img[clip(i+dr), clip(j+dc)]`` — neighbour view with edge replication.
    (``jnp.roll`` would wrap around and manufacture derivative responses at
    opposite borders; skimage's detectors have no such wrap.)"""
    h, w = img.shape
    pad = jnp.pad(img, 1, mode="edge")
    return lax.dynamic_slice(pad, (1 + dr, 1 + dc), (h, w))


def _local_max_3d(stack, threshold):
    """(S, H, W) scale-space local maxima above threshold (26-neighbourhood)."""
    s, h, w = stack.shape
    pad = jnp.pad(stack, 1, constant_values=-jnp.inf)
    best = stack
    is_max = jnp.ones(stack.shape, bool)
    for ds in (-1, 0, 1):
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if ds == dr == dc == 0:
                    continue
                nb = lax.dynamic_slice(pad, (1 + ds, 1 + dr, 1 + dc), (s, h, w))
                is_max &= best >= nb
    return is_max & (stack > threshold)


def _disc_overlap(y1, x1, r1, y2, x2, r2) -> float:
    """Intersection area of two discs over the SMALLER disc's area (the
    published pruning criterion; same formula as the scipy oracle, derived
    independently from the two-circular-segment geometry)."""
    d = float(np.hypot(y1 - y2, x1 - x2))
    if d >= r1 + r2:
        return 0.0
    small, big = sorted((r1, r2))
    if d <= big - small:
        return 1.0
    a1 = np.arccos(np.clip((d * d + r1 * r1 - r2 * r2) / (2 * d * r1),
                           -1, 1))
    a2 = np.arccos(np.clip((d * d + r2 * r2 - r1 * r1) / (2 * d * r2),
                           -1, 1))
    lens = (r1 * r1 * (a1 - np.sin(2 * a1) / 2)
            + r2 * r2 * (a2 - np.sin(2 * a2) / 2))
    return float(lens / (np.pi * small * small))


def _prune_overlapping(blobs: np.ndarray, overlap: float,
                       radius_scale: float) -> np.ndarray:
    """Host-side post-pass: drop the smaller-sigma member of every disc
    pair overlapping by more than ``overlap`` (big sigmas scanned first so
    they win). O(N²) on the ≤max_blobs survivors — off the device path.

    Chained-overlap convention: the scan is ALIVE-ordered — a blob killed
    earlier no longer kills others — whereas skimage's ``_prune_blobs``
    zeroes sigmas pairwise with no aliveness order, so a chain A→B→C can
    differ (docs/parity.md blob entry; the clean-room oracle encodes this
    same alive-order convention)."""
    if len(blobs) < 2 or overlap >= 1.0:
        return blobs
    alive = np.ones(len(blobs), bool)
    order = np.argsort(-blobs[:, 2])
    for ii, i in enumerate(order):
        if not alive[i]:
            continue
        for j in order[ii + 1:]:
            if alive[j] and _disc_overlap(
                    blobs[i, 0], blobs[i, 1], blobs[i, 2] * radius_scale,
                    blobs[j, 0], blobs[j, 1],
                    blobs[j, 2] * radius_scale) > overlap:
                alive[j] = False
    return blobs[alive]


def _extract(maxima, sigmas, max_blobs: int, stack=None):
    """Pack scale-space maxima into (N, 3) [row, col, sigma] host-side.

    When the budget binds, the STRONGEST responses are kept (ordering by
    scale index alone let >max_blobs small-sigma speckle maxima crowd out
    genuine large-scale blobs)."""
    m = np.asarray(maxima)
    ss, ys, xs = np.nonzero(m)
    if stack is not None and len(ss) > max_blobs:
        resp = np.asarray(stack)[ss, ys, xs]
        order = np.argsort(-resp)[:max_blobs]
    else:
        order = np.argsort(ss)[:max_blobs]
    return np.column_stack(
        [ys[order], xs[order], np.asarray(sigmas)[ss[order]]]
    ).astype(np.float32)


@partial(jax.jit, static_argnames=("sigmas",))
def _log_stack(img, sigmas: Tuple[float, ...]):
    outs = []
    for s in sigmas:
        blurred = _gaussian_blur(img, s)
        # scale-normalised negative laplacian
        lap = (
            4.0 * blurred
            - _shift(blurred, 1, 0) - _shift(blurred, -1, 0)
            - _shift(blurred, 0, 1) - _shift(blurred, 0, -1)
        )
        outs.append(lap * s**2)
    return jnp.stack(outs)


def blob_log(image, cfg: BlobIdentifyConfig = BlobIdentifyConfig(),
             max_blobs: int = 256) -> np.ndarray:
    """(N, 3) [row, col, radius] bright blobs via scale-normalised LoG."""
    sigmas = tuple(
        float(s)
        for s in np.linspace(cfg.min_sigma, cfg.max_sigma, cfg.num_sigma)
    )
    stack = _log_stack(jnp.asarray(image, jnp.float32), sigmas)
    maxima = _local_max_3d(stack, cfg.threshold_log)
    blobs = _extract(maxima, sigmas, max_blobs, stack=stack)
    blobs = _prune_overlapping(blobs, cfg.overlap, np.sqrt(2.0))
    blobs[:, 2] *= np.sqrt(2.0)  # radius = sigma * sqrt(2) (reference :43)
    return blobs


def blob_dog(image, cfg: BlobIdentifyConfig = BlobIdentifyConfig(),
             sigma_ratio: float = 1.6, max_blobs: int = 256) -> np.ndarray:
    """(N, 3) [row, col, radius] via difference of Gaussians."""
    img = jnp.asarray(image, jnp.float32)
    k = int(np.log(cfg.max_sigma / cfg.min_sigma) / np.log(sigma_ratio)) + 1
    sigmas = [cfg.min_sigma * sigma_ratio**i for i in range(k + 1)]
    blurred = [_gaussian_blur(img, s) for s in sigmas]
    # the difference of Gaussians is already ≈scale-normalised
    # (DoG ≈ (ratio−1)·σ²∇²G); the uniform 1/(ratio−1) factor matches
    # skimage's ``sf`` — an extra ·σᵢ would bias argmax-over-scales upward
    dogs = jnp.stack(
        [(blurred[i] - blurred[i + 1]) / (sigma_ratio - 1.0) for i in range(k)]
    )
    maxima = _local_max_3d(dogs, cfg.threshold_dog)
    blobs = _extract(maxima, tuple(sigmas[:k]), max_blobs, stack=dogs)
    blobs = _prune_overlapping(blobs, cfg.overlap, np.sqrt(2.0))
    blobs[:, 2] *= np.sqrt(2.0)
    return blobs


def blob_doh(image, cfg: BlobIdentifyConfig = BlobIdentifyConfig(),
             max_blobs: int = 256) -> np.ndarray:
    """(N, 3) [row, col, radius] via determinant of the Hessian."""
    img = jnp.asarray(image, jnp.float32)
    sigmas = tuple(
        float(s)
        for s in np.linspace(cfg.min_sigma, cfg.max_sigma, cfg.num_sigma)
    )
    outs = []
    for s in sigmas:
        b = _gaussian_blur(img, s)
        dyy = _shift(b, 1, 0) + _shift(b, -1, 0) - 2 * b
        dxx = _shift(b, 0, 1) + _shift(b, 0, -1) - 2 * b
        dxy = 0.25 * (
            _shift(b, 1, 1) + _shift(b, -1, -1)
            - _shift(b, 1, -1) - _shift(b, -1, 1)
        )
        outs.append((dxx * dyy - dxy**2) * s**4)
    hstack = jnp.stack(outs)
    maxima = _local_max_3d(hstack, cfg.threshold_doh)
    blobs = _extract(maxima, sigmas, max_blobs, stack=hstack)
    return _prune_overlapping(blobs, cfg.overlap, 1.0)
