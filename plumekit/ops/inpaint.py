"""Nearest-valid-pixel in-painting on device via jump flooding.

The gaussian detector fills −999 null pixels with the nearest valid AOD using
``scipy.interpolate.NearestNDInterpolator`` over all valid pixels
(``plume_identifier_gaussian_profile.py:451-461``) — a kd-tree build per
orbit layer on host. The TPU-native equivalent is the Jump Flooding Algorithm
(JFA): O(log max(H, W)) passes of 8-direction rolled candidate propagation,
each pass a fused gather/compare — no tree, no raggedness, vmappable over
orbit layers.

JFA+1 (an extra step-1 pass) makes errors vanishingly rare; exact nearest-
neighbour ties may resolve differently than scipy's kd-tree, which is
acceptable (ties are arbitrary in the reference too).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=())
def nearest_fill(image, invalid_mask):
    """Replace ``invalid_mask`` pixels with the value of the nearest valid
    pixel (squared-euclidean metric). Returns the filled image; if every
    pixel is invalid the image is returned unchanged."""
    h, w = image.shape
    rr = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cc = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = ~invalid_mask

    big = jnp.int32(2 * (h * h + w * w) + 1)
    best_r = jnp.where(valid, rr, -1)
    best_c = jnp.where(valid, cc, -1)
    best_d = jnp.where(valid, 0, big)

    max_dim = max(h, w)
    steps = []
    s = 1
    while s < max_dim:
        s *= 2
    while s >= 1:
        steps.append(s)
        s //= 2
    steps.append(1)  # JFA+1 refinement pass

    state = (best_r, best_c, best_d)
    for step in steps:
        br, bc, bd = state
        for dr in (-step, 0, step):
            for dc in (-step, 0, step):
                if dr == 0 and dc == 0:
                    continue
                cr = jnp.roll(br, (dr, dc), axis=(0, 1))
                ccand = jnp.roll(bc, (dr, dc), axis=(0, 1))
                has_seed = cr >= 0
                d = (rr - cr) ** 2 + (cc - ccand) ** 2
                d = jnp.where(has_seed, d, big)
                better = d < bd
                br = jnp.where(better, cr, br)
                bc = jnp.where(better, ccand, bc)
                bd = jnp.where(better, d, bd)
        state = (br, bc, bd)

    br, bc, _ = state
    found = br >= 0
    flat_idx = jnp.clip(br, 0, h - 1) * w + jnp.clip(bc, 0, w - 1)
    filled = image.reshape(-1)[flat_idx]
    return jnp.where(invalid_mask & found, filled, image)
