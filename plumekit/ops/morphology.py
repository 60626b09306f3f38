"""Binary morphology as fused XLA shift/compare ops.

The reference's singleton-pixel cleanup is skimage ``binary_erosion`` then
``binary_dilation`` with the default cross (connectivity-1) footprint
(``plume_identifier_rg.py:146-147``, ``..._basic.py:230-231``,
``..._gaussian_profile.py:151-152``); the gaussian detector also buffers the
final plume mask with a 5×5 square dilation
(``..._gaussian_profile.py:278``).

Border semantics follow skimage: erosion pads with ``True`` (borders survive),
dilation pads with ``False``. A cross-footprint op is the intersection/union
of a vertical and a horizontal 3-window, which XLA fuses into a handful of
shifted compares — no convolution needed. All ops act on the last two axes,
so leading batch/threshold axes broadcast for free (the rg sweep runs all 20
thresholds as one (T, H, W) tensor).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _shift2d(x, dr: int, dc: int, fill):
    """Shift the last two axes by (dr, dc), filling vacated cells."""
    if dr:
        pad = [(0, 0)] * (x.ndim - 2) + [(max(dr, 0), max(-dr, 0)), (0, 0)]
        x = jnp.pad(x, pad, constant_values=fill)
        x = lax.slice_in_dim(x, max(-dr, 0), x.shape[-2] - max(dr, 0), axis=-2)
    if dc:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, 0), (max(dc, 0), max(-dc, 0))]
        x = jnp.pad(x, pad, constant_values=fill)
        x = lax.slice_in_dim(x, max(-dc, 0), x.shape[-1] - max(dc, 0), axis=-1)
    return x


def binary_erosion(mask, border_value: bool = True):
    """Cross-footprint erosion (skimage default footprint semantics)."""
    m = mask
    out = (
        m
        & _shift2d(m, 1, 0, border_value)
        & _shift2d(m, -1, 0, border_value)
        & _shift2d(m, 0, 1, border_value)
        & _shift2d(m, 0, -1, border_value)
    )
    return out


def binary_dilation(mask, border_value: bool = False):
    """Cross-footprint dilation (skimage default footprint semantics)."""
    m = mask
    return (
        m
        | _shift2d(m, 1, 0, border_value)
        | _shift2d(m, -1, 0, border_value)
        | _shift2d(m, 0, 1, border_value)
        | _shift2d(m, 0, -1, border_value)
    )


def binary_opening_cross(mask):
    """Erosion→dilation singleton cleanup — the exact mask-prep step of
    ``generate_mask_dict`` (``plume_identifier_rg.py:143-148``)."""
    return binary_dilation(binary_erosion(mask))


def binary_dilation_square(mask, size: int):
    """Dilation with a ``size``×``size`` square footprint, separably as a
    row-max then column-max window (``reduce_window``); used for the 5×5
    plume buffer (``plume_identifier_gaussian_profile.py:278``)."""
    if size % 2 != 1:
        raise ValueError("square footprint size must be odd")
    x = mask.astype(jnp.int8)
    x = lax.reduce_window(
        x, jnp.int8(0), lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (size, 1),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(size // 2, size // 2), (0, 0)],
    )
    x = lax.reduce_window(
        x, jnp.int8(0), lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (1, size),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(0, 0), (size // 2, size // 2)],
    )
    return x.astype(bool)
