"""Region statistics over masks/label images — device replacement for
``skimage.measure.regionprops`` as used by the reference (area/bbox at
``plume_identifier_rg.py:266-274,423``, centroid at
``..._gaussian_profile.py:481``, covariance/principal axes at
``..._rg.py:285-294``).

All functions take boolean masks over the last two axes and reduce with
masked iota grids, so they vmap over fire/plume capacity axes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from plumekit.ops.ccl import BACKGROUND


def _iota_grids(shape):
    rr = lax.broadcasted_iota(jnp.int32, shape, 0)
    cc = lax.broadcasted_iota(jnp.int32, shape, 1)
    return rr, cc


def masked_bbox(mask):
    """Half-open bbox (min_r, min_c, max_r, max_c) of a (H, W) boolean mask —
    ``regionprops(...).bbox`` semantics. Empty mask → (H, W, 0, 0)."""
    h, w = mask.shape[-2:]
    rr, cc = _iota_grids(mask.shape[-2:])
    big_r = jnp.where(mask, rr, h)
    big_c = jnp.where(mask, cc, w)
    small_r = jnp.where(mask, rr, -1)
    small_c = jnp.where(mask, cc, -1)
    return (
        jnp.min(big_r, axis=(-2, -1)),
        jnp.min(big_c, axis=(-2, -1)),
        jnp.max(small_r, axis=(-2, -1)) + 1,
        jnp.max(small_c, axis=(-2, -1)) + 1,
    )


def masked_centroid(mask):
    """(row, col) centroid of a boolean mask (float32); NaN-free: empty masks
    give 0."""
    rr, cc = _iota_grids(mask.shape[-2:])
    n = jnp.maximum(jnp.sum(mask, axis=(-2, -1)), 1)
    r = jnp.sum(jnp.where(mask, rr, 0), axis=(-2, -1)) / n
    c = jnp.sum(jnp.where(mask, cc, 0), axis=(-2, -1)) / n
    return r.astype(jnp.float32), c.astype(jnp.float32)


def masked_moments_cov(mask):
    """Sample covariance of the (row, col) coordinates of mask pixels with
    ddof=1 — exactly ``np.cov(np.where(mask == 1))`` as the reference computes
    plume principal axes (``plume_identifier_rg.py:285-286``).

    Returns (cov_rr, cov_rc, cov_cc, n). For n <= 1 the covariances are 0.
    """
    rr, cc = _iota_grids(mask.shape[-2:])
    m = mask.astype(jnp.float32)
    n = jnp.sum(m, axis=(-2, -1))
    safe_n = jnp.maximum(n, 1.0)
    mr = jnp.sum(rr * m, axis=(-2, -1)) / safe_n
    mc = jnp.sum(cc * m, axis=(-2, -1)) / safe_n
    dr = (rr - mr[..., None, None]) * m
    dc = (cc - mc[..., None, None]) * m
    denom = jnp.maximum(n - 1.0, 1.0)
    c_rr = jnp.sum(dr * dr, axis=(-2, -1)) / denom
    c_rc = jnp.sum(dr * dc, axis=(-2, -1)) / denom
    c_cc = jnp.sum(dc * dc, axis=(-2, -1)) / denom
    return c_rr, c_rc, c_cc, n


def window_distance_matrix(win_half: int) -> np.ndarray:
    """Euclidean pixel-distance matrix of a (2w+1)² window — the reference's
    precomputed ``DISTANCE_MATRIX`` (``plume_identifier_rg.py:28-32``)."""
    x = np.arange(-win_half, win_half + 1)
    dx, dy = np.meshgrid(x, x)
    return np.sqrt(dx**2 + dy**2).astype(np.float32)


@partial(jax.jit, static_argnames=("win_half",))
def label_window_nearest(labels, r, c, win_half: int):
    """Nearest non-background label to (r, c) within a (2w+1)² window — the
    device form of ``extract_label`` (``plume_identifier_rg.py:152-170``).

    Tie-breaking matches the reference: first minimum in row-major window
    order (``np.argmin`` over the flattened window). Returns
    ``(label, found)`` where ``found`` is False when the window holds only
    background (reference returns ``None``).

    The window read is a ``dynamic_slice``; callers must supply in-bounds fire
    locations (the reference drops edge fires at
    ``plume_identifier_rg.py:122-125``).
    """
    size = 2 * win_half + 1
    # the slice start clamps at both image edges (dynamic_slice clamps the
    # high end implicitly) — distances are measured from the fire's ACTUAL
    # offset inside the window, so a clamped window is still correct (the
    # reference's precomputed centered matrix assumed in-bounds fires; for
    # those this reduces to exactly window_distance_matrix)
    start_r = jnp.clip(r - win_half, 0, labels.shape[0] - size)
    start_c = jnp.clip(c - win_half, 0, labels.shape[1] - size)
    win = lax.dynamic_slice(labels, (start_r, start_c), (size, size))
    return window_label_from(win, r, c, start_r, start_c)


def window_label_from(win, r, c, start_r, start_c):
    """The lookup half of :func:`label_window_nearest` on a pre-extracted
    window (shared so batched callers — e.g. the sweep pipeline's one
    (T, size, size) slab slice per fire — can never drift from the
    single-window semantics, including the row-major argmin tie-break)."""
    size = win.shape[-1]
    rr = jnp.arange(size, dtype=jnp.float32)[:, None] - (
        r - start_r).astype(jnp.float32)
    cc = jnp.arange(size, dtype=jnp.float32)[None, :] - (
        c - start_c).astype(jnp.float32)
    dist = jnp.sqrt(rr * rr + cc * cc)
    fg = win != BACKGROUND
    masked = jnp.where(fg, dist, jnp.inf).reshape(-1)
    idx = jnp.argmin(masked)
    return win.reshape(-1)[idx], jnp.any(fg)
