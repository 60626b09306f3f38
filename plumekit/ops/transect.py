"""Transect sampling, Savitzky–Golay smoothing and peak counting on device.

Reference semantics being reproduced (the "CHECK 5/6 plume profile" gates):

* rg: sample AOD along the minor-axis line across the plume bbox with
  bilinear ``map_coordinates``, smooth with ``savgol_filter(., 17, 3)``, and
  accept if ``find_peaks`` finds ≤ 1 peak (``plume_identifier_rg.py:319-354``);
* gaussian: same transect but masked to in-plume samples, unsmoothed, ≤ 3
  peaks (``plume_identifier_gaussian_profile.py:398-448``).

Design notes:

* the reference filters the 1000 fixed samples down to a ragged in-bounds run
  and calls scipy on the compacted array. Because the kept region of a line
  inside a bbox is a single contiguous run, a masked fixed-length formulation
  is exactly equivalent: we locate the run (first index + length), apply the
  interior correlation plus scipy's polynomial edge treatment at the run's
  (dynamic) endpoints, and count peaks only inside the run;
* ``find_peaks`` (no arguments) counts strict-rise → strict-fall transitions
  with plateau tolerance; that equals counting sign changes +→− in the
  forward-filled difference signs, implemented as an associative scan.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# Savitzky–Golay
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def savgol_coefficients(window: int, polyorder: int):
    """(interior kernel, left-edge matrix, right-edge matrix) as numpy
    constants. Interior kernel matches ``scipy.signal.savgol_coeffs``; edge
    matrices reproduce scipy's default ``mode='interp'`` polynomial-fit edges:
    ``left @ y[:window]`` gives the first ``window//2`` outputs, ``right @
    y[-window:]`` the last ``window//2``."""
    half = window // 2
    # least-squares fit of a degree-`polyorder` polynomial on window offsets
    x = np.arange(-half, half + 1, dtype=np.float64)
    a_fit = np.vander(x, polyorder + 1, increasing=True)  # (window, p+1)
    proj = np.linalg.pinv(a_fit)                           # (p+1, window)
    kernel = proj[0]                                       # evaluate at 0
    # edges: fit on the first/last `window` samples at positions 0..window-1,
    # evaluate at 0..half-1 (left) / half+1..window-1 (right)
    pos = np.arange(window, dtype=np.float64)
    a_pos = np.vander(pos, polyorder + 1, increasing=True)
    proj_pos = np.linalg.pinv(a_pos)
    left = np.vander(pos[:half], polyorder + 1, increasing=True) @ proj_pos
    right = np.vander(pos[half + 1 :], polyorder + 1, increasing=True) @ proj_pos
    return (
        kernel.astype(np.float32),
        left.astype(np.float32),
        right.astype(np.float32),
    )


@partial(jax.jit, static_argnames=("window", "polyorder"))
def savgol_smooth(values, valid, window: int, polyorder: int):
    """Savitzky–Golay smooth the single contiguous valid run inside
    ``values`` (fixed length N, boolean ``valid``), with scipy 'interp' edge
    handling at the run boundaries.

    Returns ``(smoothed, ok)``; ``ok`` is False when the run is shorter than
    ``window`` (scipy would raise there — the reference catches it and
    rejects the plume, ``plume_identifier_rg.py:305-307``).
    """
    kernel_np, left_np, right_np = savgol_coefficients(window, polyorder)
    kernel = jnp.asarray(kernel_np)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)
    half = window // 2
    n = values.shape[0]

    start = jnp.argmax(valid)              # first index of the run
    length = jnp.sum(valid)                # run length
    ok = length >= window

    run = jnp.roll(values, -start)         # run now occupies [0, length)

    # interior: correlation with the (symmetric) kernel as an explicit
    # shifted-stack dot — faster to compile than jnp.convolve and pinned to
    # full fp32 accumulation
    padded = jnp.pad(run, (half, half))
    stacked = jnp.stack([padded[j : j + n] for j in range(window)])  # (window, n)
    interior = jnp.einsum(
        "w,wn->n", kernel, stacked, precision=lax.Precision.HIGHEST
    )

    # explicit HIGHEST precision: the default matmul precision on TPU (and
    # under some CPU plugin configs) is bf16-class and the edge projections
    # amplify that rounding ~100x
    left_vals = jnp.einsum(
        "ew,w->e", left, lax.dynamic_slice(run, (0,), (window,)),
        precision=lax.Precision.HIGHEST,
    )
    right_start = jnp.maximum(length - window, 0)
    right_vals = jnp.einsum(
        "ew,w->e", right,
        lax.dynamic_slice(jnp.roll(run, -right_start), (0,), (window,)),
        precision=lax.Precision.HIGHEST,
    )

    idx = jnp.arange(n)
    out = interior
    out = jnp.where(idx < half, left_vals[jnp.clip(idx, 0, half - 1)], out)
    r_idx = jnp.clip(idx - (length - half), 0, half - 1)
    out = jnp.where(idx >= length - half, right_vals[r_idx], out)
    out = jnp.roll(out, start)
    return jnp.where(valid, out, 0.0), ok


# ---------------------------------------------------------------------------
# Peak counting
# ---------------------------------------------------------------------------

@jax.jit
def count_peaks_masked(values, valid, flat_tol=0.0):
    """Number of ``scipy.signal.find_peaks`` peaks in the COMPACTED valid
    samples — i.e. ``find_peaks(values[valid])``, the reference semantics
    (``plume_identifier_gaussian_profile.py:433-435`` gathers the in-mask
    samples into one array before find_peaks, so peaks can form across a
    mask gap's junction).

    A peak is a strict rise followed (across any plateau) by a strict fall.
    ``flat_tol`` treats |diff| <= flat_tol as plateau. With 0 this is exact
    scipy semantics; the identify pipeline passes a few-ULP tolerance so that
    fp32 rounding ripple in near-flat regions cannot mint spurious peaks
    (real MAIAC AOD is quantised at 1e-3, far above the tolerance, so
    decisions on real data are unchanged).
    """
    v = values

    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    # forward-fill of the last valid value; shifted, it gives each valid
    # sample its compacted-sequence predecessor (gaps skipped, not reset)
    fv, fhas = lax.associative_scan(
        combine, (jnp.where(valid, v, 0.0), valid))
    prev_v = jnp.concatenate([jnp.zeros((1,), fv.dtype), fv[:-1]])
    prev_has = jnp.concatenate([jnp.zeros((1,), jnp.bool_), fhas[:-1]])
    dvalid = valid & prev_has
    d = v - prev_v
    sign = jnp.where(jnp.abs(d) <= flat_tol, 0.0, jnp.sign(d))
    sign = jnp.where(dvalid, sign, 0.0)
    ff, _ = lax.associative_scan(combine, (sign, sign != 0.0))
    # peak: this compacted diff falls, the previous nonzero one rose
    prev = jnp.concatenate([jnp.zeros((1,), ff.dtype), ff[:-1]])
    peaks = (sign < 0) & (prev > 0)
    return jnp.sum(peaks)


# ---------------------------------------------------------------------------
# Line transects
# ---------------------------------------------------------------------------

def _line_coords(slope, intercept, min_c, max_c, n_samples: int):
    """The transect sampling parameterisation (x uniform over
    [min_c, max_c], y on the line) — single source shared by
    :func:`line_transect` and :func:`line_transect_in_mask` so the mask
    test's integer cells can never desynchronise from the sampled
    coordinates."""
    t = jnp.arange(n_samples, dtype=jnp.float32) / (n_samples - 1)
    x = min_c + (max_c - min_c) * t
    y = slope * x + intercept
    return x, y


@partial(jax.jit, static_argnames=("n_samples",))
def line_transect(aod, slope, intercept, min_r, min_c, max_r, max_c,
                  n_samples: int = 1000):
    """Sample AOD along ``y = slope*x + intercept`` for x in
    [min_c, max_c] with ``n_samples`` points, keeping samples whose y lies
    strictly inside (min_r, max_r) — the rg transect construction
    (``plume_identifier_rg.py:331-344``). Bilinear interpolation matches
    ``scipy.ndimage.map_coordinates(order=1)``.

    Returns ``(samples, valid)`` of fixed length ``n_samples``.
    """
    x, y = _line_coords(slope, intercept, min_c, max_c, n_samples)
    valid = (y > min_r) & (y < max_r)
    # scipy's default mode='constant' (cval 0) returns 0 for ANY coordinate
    # outside the image extent [0, n-1] (no edge blending — verified against
    # scipy), and edge-abutting plumes (half-open bbox => max_c can equal W)
    # do sample past the last column; a bare clamp pinned those samples to
    # the edge pixel and diverged from the oracle there
    h, w = aod.shape
    inb = (y >= 0) & (y <= h - 1) & (x >= 0) & (x <= w - 1)
    samples = jax.scipy.ndimage.map_coordinates(
        aod, [jnp.clip(y, 0, h - 1), jnp.clip(x, 0, w - 1)], order=1)
    return jnp.where(inb, samples, 0.0), valid


@partial(jax.jit, static_argnames=("n_samples",))
def line_transect_in_mask(aod, mask, slope, intercept, min_r, min_c, max_r,
                          max_c, n_samples: int = 1000):
    """Gaussian-variant transect: additionally require the *integer* sample
    cell to be inside the plume mask
    (``plume_identifier_gaussian_profile.py:425-427`` uses
    ``mask[y.astype(int), x.astype(int)]``)."""
    samples, valid = line_transect(
        aod, slope, intercept, min_r, min_c, max_r, max_c, n_samples
    )
    x, y = _line_coords(slope, intercept, min_c, max_c, n_samples)
    yi = jnp.clip(y.astype(jnp.int32), 0, mask.shape[0] - 1)
    xi = jnp.clip(x.astype(jnp.int32), 0, mask.shape[1] - 1)
    inside = mask[yi, xi]
    return samples, valid & inside
