"""Clean-room NumPy/scipy oracle of the reference gaussian-profile detector
(``plume_identifier_gaussian_profile.py``) for parity diffing. Shares the
sweep machinery with the rg oracle where the reference shares it; differences
mirror the reference: raster fire clustering, null-fraction gate, axis ratio
8, unsmoothed in-mask transect with ≤3 peaks, 5×5 final dilation.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.interpolate import NearestNDInterpolator
from scipy.signal import find_peaks

from oracle_rg import (
    EIGHT,
    extract_label,
    find_threshold_index,
    opening,
    window_distance_matrix,
)


def interpolate_aod_nearest(aod, null_value=-999.0):
    good = aod != null_value
    if good.all():
        return aod.copy()
    yy, xx = np.mgrid[0 : aod.shape[0], 0 : aod.shape[1]]
    interp = NearestNDInterpolator(
        np.column_stack([xx[good], yy[good]]), aod[good]
    )
    return interp(xx.ravel(), yy.ravel()).reshape(aod.shape)


def cluster_fires(shape, fire_rows, fire_cols, min_size=3):
    grid = np.zeros(shape)
    grid[np.asarray(fire_rows), np.asarray(fire_cols)] = 1
    labels, n = ndimage.label(grid, structure=EIGHT)
    rows, cols = [], []
    for i in range(1, n + 1):
        ys, xs = np.nonzero(labels == i)
        if ys.size < min_size:
            continue
        rows.append(int(ys.mean()))
        cols.append(int(xs.mean()))
    return np.asarray(rows, np.int32), np.asarray(cols, np.int32)


def check_plume_profile(dists, coords, aod, plume_mask, bbox, cfg):
    small_axis = coords[int(np.argmin(dists))]
    dx = small_axis[0][1] - small_axis[1][1]
    dy = small_axis[0][0] - small_axis[1][0]
    with np.errstate(divide="ignore", invalid="ignore"):
        m = dy / dx
    b = small_axis[0][0] - small_axis[0][1] * m
    min_r, min_c, max_r, max_c = bbox
    x = np.linspace(min_c, max_c, cfg.n_transect)
    y = m * x + b
    keep = (y > min_r) & (y < max_r)
    y, x = y[keep], x[keep]
    with np.errstate(invalid="ignore"):
        inside = plume_mask[
            np.clip(y.astype(int), 0, aod.shape[0] - 1),
            np.clip(x.astype(int), 0, aod.shape[1] - 1),
        ]
    y, x = y[inside], x[inside]
    transect = ndimage.map_coordinates(aod, (y, x), order=1)
    peaks, _ = find_peaks(transect)
    return len(peaks) <= cfg.max_peaks


def assess_plume(aod, null_mask, labelled, label_for_fire, cfg):
    if label_for_fire is None:
        return None
    plume_mask = labelled == label_for_fire
    area = int(plume_mask.sum())
    if area == 0 or area < cfg.min_plume_pixels or area > cfg.max_plume_pixels:
        return None
    if aod[plume_mask].max() < cfg.max_lim:
        return None
    frac = null_mask[plume_mask].sum() / float(area)
    if frac > cfg.max_invalid_frac:
        return None
    yx = np.array(np.where(plume_mask == 1))
    eigvals, eigvecs = np.linalg.eig(np.cov(yx))
    center = yx.mean(-1)
    dists, coords = [], []
    for val, vec in zip(eigvals, eigvecs.T):
        v1, v2 = center + val * vec, center - val * vec
        dists.append(np.linalg.norm(v1 - v2))
        coords.append([v1, v2])
    big, small = max(dists), min(dists)
    if small == 0 or big / small < cfg.min_axis_ratio:
        return None
    ys, xs = np.nonzero(plume_mask)
    bbox = (ys.min(), xs.min(), ys.max() + 1, xs.max() + 1)
    try:
        ok = check_plume_profile(dists, coords, aod, plume_mask, bbox, cfg)
    except Exception:
        return None
    if not ok:
        return None
    return plume_mask


def oracle_identify_layer(aod_raw, fire_rows, fire_cols, cfg):
    """Full gaussian layer pass. Returns list over scales of per-cluster
    results (None or final dilated mask), plus the cluster positions and the
    interpolated field."""
    null_mask = aod_raw == cfg.null_value
    aod = interpolate_aod_nearest(aod_raw, cfg.null_value)
    crows, ccols = cluster_fires(aod.shape, fire_rows, fire_cols,
                                 cfg.min_fire_cluster_px)
    dist = window_distance_matrix(cfg.win_half)

    all_scales = []
    for thresholds in cfg.threshold_sets():
        thresholds = np.asarray(thresholds)
        masks = [opening(aod > t) for t in thresholds]
        extents = np.zeros((len(thresholds), len(crows)))
        for ti, m in enumerate(masks):
            labelled, _ = ndimage.label(m, structure=EIGHT)
            for fi, (r, c) in enumerate(zip(crows, ccols)):
                lab = extract_label(labelled, r, c, cfg.win_half, dist)
                if lab is not None:
                    extents[ti, fi] = (labelled == lab).sum()
        t_idx = find_threshold_index(extents)
        results = []
        for fi, ti in enumerate(t_idx):
            if ti is None:
                results.append(None)
                continue
            labelled, _ = ndimage.label(masks[ti], structure=EIGHT)
            lab = extract_label(labelled, crows[fi], ccols[fi], cfg.win_half,
                                dist)
            mask = assess_plume(aod, null_mask, labelled, lab, cfg)
            if mask is None:
                results.append(None)
                continue
            dilated = ndimage.binary_dilation(mask, structure=np.ones((5, 5)))
            results.append(dict(t_index=ti, mask=dilated,
                                extents=extents[:, fi]))
        all_scales.append((extents, results))
    return all_scales, (crows, ccols), aod, null_mask
