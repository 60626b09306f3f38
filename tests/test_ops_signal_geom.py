"""Golden tests: savgol/peaks/transect/inpaint/geometry/segment ops vs scipy."""

import numpy as np
import pytest
from scipy import ndimage, signal
from scipy.interpolate import NearestNDInterpolator
from scipy.spatial import ConvexHull, Delaunay

import jax.numpy as jnp

from plumekit.ops import (
    savgol_smooth,
    count_peaks_masked,
    line_transect,
    nearest_fill,
    eig2x2_sym,
    masked_bbox,
    masked_centroid,
    masked_moments_cov,
    label_window_nearest,
    points_in_convex_hull,
    dbscan_haversine,
)
from plumekit.ops.ccl import connected_components


def test_savgol_full_array_matches_scipy(rng):
    x = rng.normal(size=80).astype(np.float32)
    valid = np.ones(80, dtype=bool)
    ours, ok = savgol_smooth(jnp.asarray(x), jnp.asarray(valid), 17, 3)
    assert bool(ok)
    ref = signal.savgol_filter(x, 17, 3)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_savgol_contiguous_run_matches_scipy_on_compacted(rng):
    x = rng.normal(size=120).astype(np.float32)
    valid = np.zeros(120, dtype=bool)
    valid[23:97] = True
    ours, ok = savgol_smooth(jnp.asarray(x), jnp.asarray(valid), 17, 3)
    assert bool(ok)
    ref = signal.savgol_filter(x[23:97], 17, 3)
    np.testing.assert_allclose(np.asarray(ours)[23:97], ref, rtol=2e-4, atol=2e-4)


def test_savgol_short_run_flags_not_ok(rng):
    x = rng.normal(size=30).astype(np.float32)
    valid = np.zeros(30, dtype=bool)
    valid[5:15] = True  # run of 10 < window 17
    _, ok = savgol_smooth(jnp.asarray(x), jnp.asarray(valid), 17, 3)
    assert not bool(ok)


@pytest.mark.parametrize("seed", range(6))
def test_peak_count_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.normal(size=200)).astype(np.float32)
    ref = len(signal.find_peaks(x)[0])
    got = int(count_peaks_masked(jnp.asarray(x), jnp.ones(200, dtype=bool)))
    assert got == ref


def test_peak_count_with_plateaus():
    x = np.array([0, 1, 2, 2, 2, 1, 0, 1, 1, 3, 3, 0, 5], dtype=np.float32)
    ref = len(signal.find_peaks(x)[0])
    got = int(count_peaks_masked(jnp.asarray(x), jnp.ones(x.size, dtype=bool)))
    assert got == ref


def test_peak_count_masked_compacts_across_gaps():
    # reference semantics: find_peaks runs on the GATHERED in-mask samples
    # (oracle_gaussian.py), so peaks can form across a gap's junction
    x = np.array([0, 3, 0, 9, 9, 9, 0, 2, 0], dtype=np.float32)
    valid = np.array([1, 1, 1, 0, 0, 0, 1, 1, 1], dtype=bool)
    ref = len(signal.find_peaks(x[valid])[0])
    assert int(count_peaks_masked(jnp.asarray(x), jnp.asarray(valid))) == ref
    # junction case: run 1 ends rising, run 2 starts falling -> one peak
    # exists only in the compacted view
    x2 = np.array([0, 3, 9, 9, 2, 0], dtype=np.float32)
    v2 = np.array([1, 1, 0, 0, 1, 1], dtype=bool)
    ref2 = len(signal.find_peaks(x2[v2])[0])
    assert ref2 == 1
    assert int(count_peaks_masked(jnp.asarray(x2), jnp.asarray(v2))) == ref2


def test_peak_count_masked_random_vs_scipy_compacted():
    rng = np.random.default_rng(7)
    for _ in range(20):
        x = rng.random(80).astype(np.float32)
        valid = rng.random(80) > 0.3
        ref = len(signal.find_peaks(x[valid])[0])
        got = int(count_peaks_masked(jnp.asarray(x), jnp.asarray(valid)))
        assert got == ref


def test_line_transect_constant_boundary_matches_scipy():
    # edge-abutting plumes sample past the image (half-open bbox): scipy's
    # default constant-0 boundary must be reproduced, not an edge clamp
    rng = np.random.default_rng(3)
    aod = rng.random((32, 32)).astype(np.float32) + 0.5
    m, b = 0.1, 28.0
    samples, valid = line_transect(
        jnp.asarray(aod), m, b, 0.0, 20.0, 33.0, 34.0, n_samples=200)
    x = np.linspace(20.0, 34.0, 200)
    y = m * x + b
    ref = ndimage.map_coordinates(aod, (y, x), order=1)
    np.testing.assert_allclose(np.asarray(samples), ref, rtol=1e-5,
                               atol=1e-5)


def test_line_transect_matches_map_coordinates(rng):
    aod = rng.random((64, 64)).astype(np.float32)
    m, b = 0.3, 5.0
    min_r, min_c, max_r, max_c = 10, 8, 50, 55
    samples, valid = line_transect(
        jnp.asarray(aod), m, b, float(min_r), float(min_c), float(max_r),
        float(max_c), n_samples=500,
    )
    x = np.linspace(min_c, max_c, 500)
    y = m * x + b
    keep = (y > min_r) & (y < max_r)
    ref = ndimage.map_coordinates(aod, (y[keep], x[keep]), order=1)
    np.testing.assert_allclose(
        np.asarray(samples)[np.asarray(valid)], ref, rtol=1e-5, atol=1e-5
    )


def test_nearest_fill_matches_nearest_interpolator(rng):
    aod = rng.random((48, 48)).astype(np.float32)
    invalid = np.zeros((48, 48), dtype=bool)
    invalid[10:18, 20:30] = True
    invalid[40:45, 2:6] = True
    ours = np.asarray(nearest_fill(jnp.asarray(aod), jnp.asarray(invalid)))

    good = ~invalid
    yy, xx = np.mgrid[0:48, 0:48]
    interp = NearestNDInterpolator(
        np.column_stack([xx[good], yy[good]]), aod[good]
    )
    ref = interp(xx.ravel(), yy.ravel()).reshape(48, 48)
    # values must match except where equidistant ties break differently;
    # verify distance-optimality instead of exact tie agreement
    mismatch = ours != ref
    assert mismatch.mean() < 0.02
    np.testing.assert_array_equal(ours[good], aod[good])


def test_eig2x2_matches_numpy(rng):
    for _ in range(20):
        a, b, c = rng.random(3)
        mat = np.array([[a, b], [b, c]])
        ref = np.sort(np.linalg.eigvalsh(mat))
        l_max, l_min, v_max, v_min = eig2x2_sym(a, b, c)
        np.testing.assert_allclose(
            [float(l_min), float(l_max)], ref, rtol=1e-4, atol=1e-6
        )
        # eigenvector check: A v = l v
        v = np.asarray(v_max)
        np.testing.assert_allclose(mat @ v, float(l_max) * v, atol=1e-6)


def test_masked_stats_match_numpy(rng):
    m = np.zeros((40, 40), dtype=bool)
    m[5:20, 8:30] = rng.random((15, 22)) < 0.6
    jm = jnp.asarray(m)
    ys, xs = np.where(m)
    min_r, min_c, max_r, max_c = masked_bbox(jm)
    assert (int(min_r), int(min_c), int(max_r), int(max_c)) == (
        ys.min(), xs.min(), ys.max() + 1, xs.max() + 1,
    )
    r, c = masked_centroid(jm)
    np.testing.assert_allclose([float(r), float(c)], [ys.mean(), xs.mean()],
                               rtol=1e-5)
    c_rr, c_rc, c_cc, n = masked_moments_cov(jm)
    ref_cov = np.cov(np.vstack([ys, xs]))
    np.testing.assert_allclose(float(c_rr), ref_cov[0, 0], rtol=1e-4)
    np.testing.assert_allclose(float(c_rc), ref_cov[0, 1], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(c_cc), ref_cov[1, 1], rtol=1e-4)
    assert int(n) == ys.size


def _oracle_extract_label(labelled, r, c, w, dist):
    sub = labelled[r - w : r + w + 1, c - w : c + w + 1]
    mask = sub != 0
    if mask.any():
        return sub[mask][np.argmin(dist[mask])]
    return None


def test_label_window_nearest_matches_reference_semantics(rng):
    from plumekit.ops.segment import window_distance_matrix

    w = 7
    dist = window_distance_matrix(w)
    m = rng.random((64, 64)) < 0.2
    lbl = np.asarray(connected_components(jnp.asarray(m), 2))
    for _ in range(20):
        r = int(rng.integers(w + 1, 64 - w - 1))
        c = int(rng.integers(w + 1, 64 - w - 1))
        got_label, found = label_window_nearest(jnp.asarray(lbl), r, c, w)
        ref = _oracle_extract_label(lbl, r, c, w, dist)
        if ref is None:
            assert not bool(found)
        else:
            assert bool(found) and int(got_label) == int(ref)


def test_points_in_hull_matches_delaunay(rng):
    pts = rng.random((30, 2)) * 20
    hull = ConvexHull(pts)
    verts = pts[hull.vertices]
    k_pad = 16
    padded = np.zeros((k_pad, 2))
    padded[: len(verts)] = verts
    padded[len(verts):] = verts[-1]
    queries = rng.random((200, 2)) * 24 - 2
    got = np.asarray(
        points_in_convex_hull(
            jnp.asarray(queries), jnp.asarray(padded), len(verts)
        )
    )
    ref = Delaunay(verts).find_simplex(queries) >= 0
    # boundary-grazing points may differ by float epsilon; interior agrees
    disagree = got != ref
    assert disagree.mean() < 0.02


def test_points_in_hull_degenerate_contains_nothing(rng):
    """n_valid < 3 (empty/padded slot, point, segment) must contain no
    query point — the masked cross products are all zero there, and
    without the gate EVERY point tests inside an empty hull."""
    queries = jnp.asarray(rng.random((50, 2)) * 10)
    padded = jnp.zeros((8, 2))
    for n_valid in (0, 1, 2):
        got = np.asarray(points_in_convex_hull(queries, padded, n_valid))
        assert not got.any(), f"n_valid={n_valid} leaked containment"


def test_dbscan_haversine_matches_sklearn(rng):
    from sklearn.cluster import DBSCAN

    lats = np.concatenate([rng.normal(-10, 0.01, 12), rng.normal(-12, 0.01, 8)])
    lons = np.concatenate([rng.normal(-60, 0.01, 12), rng.normal(-61, 0.01, 8)])
    ours = dbscan_haversine(lats, lons, eps_km=5.0)
    ref = DBSCAN(
        eps=5.0 / 6371.0, min_samples=1, algorithm="ball_tree",
        metric="haversine",
    ).fit(np.radians(np.column_stack([lats, lons]))).labels_
    # same partition
    assert len(set(zip(ours, ref))) == len(set(ours)) == len(set(ref))
