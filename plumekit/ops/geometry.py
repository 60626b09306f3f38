"""Plume geometry: closed-form 2×2 eigendecomposition, principal axes, and
convex-hull containment.

The reference derives plume principal axes from ``np.linalg.eig(np.cov(yx))``
(``plume_identifier_rg.py:285-302``) — a 2×2 symmetric problem with a closed
form, so no LAPACK is needed on device. Hull *vertex extraction* stays on
host (scipy ``ConvexHull``, ragged output; ``plume_identifier_rg.py:414``),
while the containment test — the reference uses Delaunay ``find_simplex >= 0``
(``plume_selector.py:88-99``), equivalent to convex-polygon containment — is
a fixed-size half-plane sign test on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def eig2x2_sym(a, b, c):
    """Eigen-decomposition of [[a, b], [b, c]] (symmetric PSD).

    Returns ``(l_max, l_min, v_max, v_min)`` with unit eigenvectors stacked on
    the last axis; broadcasts over leading axes.
    """
    tr = a + c
    disc = jnp.sqrt(jnp.maximum((a - c) ** 2 + 4.0 * b**2, 0.0))
    l_max = 0.5 * (tr + disc)
    l_min = 0.5 * (tr - disc)

    # eigenvector for l_max: (b, l_max - a) unless b ~ 0
    def unit(vx, vy):
        n = jnp.sqrt(vx**2 + vy**2)
        safe = n > 1e-20
        n = jnp.where(safe, n, 1.0)
        vx = jnp.where(safe, vx / n, 1.0)
        vy = jnp.where(safe, vy / n, 0.0)
        return vx, vy

    # choose the better-conditioned formula per element
    use_b = jnp.abs(b) > 1e-20
    vx1 = jnp.where(use_b, b, jnp.where(a >= c, 1.0, 0.0))
    vy1 = jnp.where(use_b, l_max - a, jnp.where(a >= c, 0.0, 1.0))
    vx1, vy1 = unit(vx1, vy1)
    # v_min is perpendicular
    vx2, vy2 = -vy1, vx1
    v_max = jnp.stack([vx1, vy1], axis=-1)
    v_min = jnp.stack([vx2, vy2], axis=-1)
    return l_max, l_min, v_max, v_min


def principal_axes(cov_rr, cov_rc, cov_cc):
    """Axis "distances" and directions as the reference constructs them:
    endpoints ``center ± eigval * eigvec`` give axis length ``2 * eigval``
    (``plume_identifier_rg.py:288-294`` — note these are *variance*-scaled
    axes, not standard deviations; parity preserved deliberately).

    Coordinates are (row, col) = (y, x): cov is over ``np.where(mask)``
    outputs. Returns ``(d_major, d_minor, v_major, v_minor)`` where vectors
    are (y, x) unit pairs.
    """
    l_max, l_min, v_max, v_min = eig2x2_sym(cov_rr, cov_rc, cov_cc)
    return 2.0 * l_max, 2.0 * l_min, v_max, v_min


def points_in_convex_hull(points, hull_vertices, n_valid):
    """Boolean containment of ``points`` (N, 2) in the convex polygon given by
    ``hull_vertices`` (K, 2) of which the first ``n_valid`` are real (the rest
    pad). Vertices must be in hull order (scipy ``ConvexHull.vertices`` is
    CCW). Boundary points count as inside (matches Delaunay
    ``find_simplex >= 0``). Degenerate inputs (``n_valid < 3``: empty/padded
    slot, point, or segment) contain nothing — without this gate the masked
    cross products are all zero and EVERY query point would test inside an
    empty hull."""
    k = hull_vertices.shape[0]
    idx = jnp.arange(k)
    nxt = jnp.where(idx + 1 < n_valid, idx + 1, 0)
    a = hull_vertices
    bvert = hull_vertices[nxt]
    edge = bvert - a  # (K, 2)
    rel = points[:, None, :] - a[None, :, :]  # (N, K, 2)
    cross = edge[None, :, 0] * rel[:, :, 1] - edge[None, :, 1] * rel[:, :, 0]
    live = (idx < n_valid)[None, :]
    cross = jnp.where(live, cross, 0.0)
    # CCW polygons: inside iff all crosses >= 0; tolerate CW by symmetric test
    inside_ccw = jnp.all(cross >= 0.0, axis=1)
    inside_cw = jnp.all(cross <= 0.0, axis=1)
    return (inside_ccw | inside_cw) & (n_valid >= 3)


def convex_hull_vertices_host(points: np.ndarray) -> np.ndarray:
    """Hull vertex indices via scipy (host-side, ragged;
    ``plume_identifier_rg.py:414`` semantics)."""
    from scipy.spatial import ConvexHull

    return ConvexHull(points).vertices
