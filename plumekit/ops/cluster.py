"""Fire clustering.

Two clustering modes exist in the reference:

* basic/rg: DBSCAN over fire lat/lon with haversine metric, ``min_samples=1``
  and eps = cluster_dist_km / 6371 radians (``plume_identifier_rg.py:61-66``).
  With ``min_samples=1`` DBSCAN degenerates to connected components of the
  eps-neighbourhood graph, so the native implementation is a cKDTree in
  unit-sphere chord space + union-find — exact, no sklearn dependency.
  Fire counts per scene are O(10²–10³); this stays host-side (SURVEY.md §2.1).
* gaussian: rasterise fires onto the grid, 8-connected label, drop clusters
  under 3 px, take integer centroids
  (``plume_identifier_gaussian_profile.py:126-139, 480-483``). This runs on
  device with fixed fire capacity (:func:`raster_cluster_centroids`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

#: sphere radius (km) used to convert eps_km → radians, matching the
#: reference's ``eps=CLUSTER_DIST / 6371.`` (``plume_identifier_rg.py:63``)
DBSCAN_EARTH_RADIUS_KM = 6371.0


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            p[i] = p[p[i]]
            i = p[i]
        return i

    def union(self, i: int, j: int) -> None:
        ri, rj = self.find(i), self.find(j)
        if ri != rj:
            self.parent[max(ri, rj)] = min(ri, rj)


def dbscan_haversine(lats, lons, eps_km: float, min_samples: int = 1
                     ) -> np.ndarray:
    """Cluster labels (0..K-1, ordered by first occurrence) for points within
    ``eps_km`` great-circle distance — exact DBSCAN(min_samples=1) semantics.
    """
    if min_samples != 1:
        raise NotImplementedError(
            "reference uses min_samples=1 (plume_identifier_rg.py:63); "
            "general DBSCAN is out of scope"
        )
    from scipy.spatial import cKDTree

    lats = np.radians(np.asarray(lats, dtype=np.float64))
    lons = np.radians(np.asarray(lons, dtype=np.float64))
    n = lats.size
    if n == 0:
        return np.zeros((0,), dtype=np.int64)
    xyz = np.column_stack(
        [np.cos(lats) * np.cos(lons), np.cos(lats) * np.sin(lons), np.sin(lats)]
    )
    eps_angle = eps_km / DBSCAN_EARTH_RADIUS_KM
    chord = 2.0 * np.sin(eps_angle / 2.0)
    tree = cKDTree(xyz)
    uf = _UnionFind(n)
    for i, j in tree.query_pairs(chord):
        uf.union(i, j)
    roots = np.array([uf.find(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    # already sklearn's first-occurrence label order: the union always
    # parents the larger root under the smaller, so every cluster's root
    # is its minimum member index and np.unique's ascending-root inverse
    # numbers clusters by first appearance
    return labels.astype(np.int64)


def mean_cluster_positions(fire_df, eps_km: float):
    """Cluster fires and return per-cluster mean (latitude, longitude) — the
    reference's ``mean_fire_position`` (``plume_identifier_rg.py:61-66``)."""
    labels = dbscan_haversine(
        fire_df["latitude"].to_numpy(), fire_df["longitude"].to_numpy(), eps_km
    )
    df = fire_df.copy()
    df["cluster_id"] = labels
    return df.groupby("cluster_id").agg({"latitude": "mean", "longitude": "mean"})


def raster_cluster_centroids(shape: Tuple[int, int], rows, cols, valid,
                             min_size: int):
    """Device fire clustering for the gaussian detector.

    Rasterise valid fires onto ``shape``, 8-connected label, drop clusters
    smaller than ``min_size`` px, and return one integer centroid per cluster
    (truncated, as the reference's ``.astype(int)``,
    ``plume_identifier_gaussian_profile.py:482-483``) packed into fixed (F,)
    arrays with a validity mask.
    """
    import jax.numpy as jnp
    from jax import lax

    from plumekit.ops.ccl import ccl_backend, connected_components

    h, w = shape
    grid = jnp.zeros((h, w), dtype=bool)
    # route INVALID slots out of bounds so mode="drop" discards them: the
    # old scatter wrote False at (0, 0) for every padding slot, and XLA's
    # duplicate-index set order is undefined — a real fire rasterised at
    # (0, 0) could be erased nondeterministically
    oob_r = jnp.where(valid, rows, h)
    oob_c = jnp.where(valid, cols, w)
    grid = grid.at[oob_r, oob_c].set(True, mode="drop")
    safe_r = jnp.where(valid, rows, 0)     # clamped for the gather below
    safe_c = jnp.where(valid, cols, 0)

    from plumekit.ops.pallas.ccl_sweep import (
        multi_threshold_ccl, sweep_fits_vmem)

    if ccl_backend() == "pallas" and sweep_fits_vmem(h, w):
        labels = multi_threshold_ccl(grid[None], nested=False)[0]
    else:
        labels = connected_components(grid, connectivity=2)

    fire_labels = jnp.where(valid, labels[safe_r, safe_c], 0)

    # everything per-FIRE as fused masked reductions over the label image —
    # no H·W+1-segment scatters, no per-label gathers (only the ≤F labels
    # that carry fires are ever needed)
    lab_eff = jnp.where(fire_labels != 0, fire_labels, -1)
    on = labels[None, :, :] == lab_eff[:, None, None]          # (F, H, W)
    cnt = jnp.sum(on, axis=(1, 2), dtype=jnp.int32)
    rr = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cc = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    sum_r = jnp.sum(jnp.where(on, rr[None], 0), axis=(1, 2))
    sum_c = jnp.sum(jnp.where(on, cc[None], 0), axis=(1, 2))

    # remove_small_objects(min_size) applied per fire's cluster
    alive = (fire_labels != 0) & (cnt >= min_size)
    # first-occurrence dedup over the (small) fire capacity axis
    eq = fire_labels[:, None] == fire_labels[None, :]
    earlier = jnp.tril(eq, k=-1).any(axis=1)
    is_rep = alive & ~earlier

    n = jnp.maximum(cnt, 1)
    # float mean then truncation — the reference's ``.astype(int)`` of the
    # centroid (``plume_identifier_gaussian_profile.py:482-483``)
    cr = (sum_r / n).astype(jnp.int32)
    ccol = (sum_c / n).astype(jnp.int32)
    return (
        jnp.where(is_rep, cr, 0),
        jnp.where(is_rep, ccol, 0),
        is_rep,
    )
