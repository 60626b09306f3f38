"""On-device augmentation (BASELINE.json config 4): per-sample random flips
and 90° rotations of (tile, tile, C) tensors — the dihedral group D4, the
standard EO-segmentation augmentation. Pure jnp, fused into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _apply_d4(img, code):
    """code ∈ [0, 8): bit 0/1 = flips, bit 2 = transpose (rot90)."""
    img = jax.lax.cond(code & 1, lambda x: x[::-1, :, :], lambda x: x, img)
    img = jax.lax.cond(code & 2, lambda x: x[:, ::-1, :], lambda x: x, img)
    img = jax.lax.cond(
        code & 4, lambda x: jnp.swapaxes(x, 0, 1), lambda x: x, img
    )
    return img


def augment_batch(rng, xs, ys):
    """Random D4 transform per sample, identically applied to inputs and
    labels. xs: (B, T, T, C); ys: (B, T, T, 1)."""
    codes = jax.random.randint(rng, (xs.shape[0],), 0, 8)
    xs = jax.vmap(_apply_d4)(xs, codes)
    ys = jax.vmap(_apply_d4)(ys, codes)
    return xs, ys
