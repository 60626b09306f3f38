"""Blob-detector baseline (LoG / DoG / DoH) on device.

The reference's ``plume_indetifier_blob.py`` (typo is the repo's) compares
skimage ``blob_log``/``blob_dog``/``blob_doh`` on one hard-coded granule and
is broken as committed (``import src.features.tools`` never binds ``tools``,
SURVEY.md bug #1). Here the three detectors are implemented natively as
separable Gaussian pyramids + 3-D local-max extraction, jit-compiled; radii
follow the reference's ``r = σ·√2`` convention (``:43,46``).

This is an optional experiment path (SURVEY.md §3.5), not part of the core
identify API; exact skimage parity is not claimed.
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
    k = jnp.asarray(_gaussian_kernel(sigma))
    r = k.shape[0] // 2
    pad = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    img = lax.conv_general_dilated(
        pad[None, None], k[None, None, :, None], (1, 1), "VALID",
        precision=lax.Precision.HIGHEST,
    )[0, 0]
    pad = jnp.pad(img, ((0, 0), (r, r)), mode="edge")
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
        float(s) for s in np.linspace(1.0, cfg.max_sigma, cfg.num_sigma)
    )
    stack = _log_stack(jnp.asarray(image, jnp.float32), sigmas)
    maxima = _local_max_3d(stack, cfg.threshold_log)
    blobs = _extract(maxima, sigmas, max_blobs, stack=stack)
    blobs[:, 2] *= np.sqrt(2.0)  # radius = sigma * sqrt(2) (reference :43)
    return blobs


def blob_dog(image, cfg: BlobIdentifyConfig = BlobIdentifyConfig(),
             sigma_ratio: float = 1.6, max_blobs: int = 256) -> np.ndarray:
    """(N, 3) [row, col, radius] via difference of Gaussians."""
    img = jnp.asarray(image, jnp.float32)
    k = int(np.log(cfg.max_sigma) / np.log(sigma_ratio)) + 1
    sigmas = [1.0 * sigma_ratio**i for i in range(k + 1)]
    blurred = [_gaussian_blur(img, s) for s in sigmas]
    # the difference of Gaussians is already ≈scale-normalised
    # (DoG ≈ (ratio−1)·σ²∇²G); the uniform 1/(ratio−1) factor matches
    # skimage's ``sf`` — an extra ·σᵢ would bias argmax-over-scales upward
    dogs = jnp.stack(
        [(blurred[i] - blurred[i + 1]) / (sigma_ratio - 1.0) for i in range(k)]
    )
    maxima = _local_max_3d(dogs, cfg.threshold_dog)
    blobs = _extract(maxima, tuple(sigmas[:k]), max_blobs, stack=dogs)
    blobs[:, 2] *= np.sqrt(2.0)
    return blobs


def blob_doh(image, cfg: BlobIdentifyConfig = BlobIdentifyConfig(),
             max_blobs: int = 256) -> np.ndarray:
    """(N, 3) [row, col, radius] via determinant of the Hessian."""
    img = jnp.asarray(image, jnp.float32)
    sigmas = tuple(
        float(s) for s in np.linspace(1.0, cfg.max_sigma, cfg.num_sigma)
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
    return _extract(maxima, sigmas, max_blobs, stack=hstack)
