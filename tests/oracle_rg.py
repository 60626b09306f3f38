"""Pure NumPy/scipy oracle of the reference rg detector's *intended*
semantics (``plume_identifier_rg.py``), written independently of the device
pipeline for parity diffing (SURVEY.md §4 point 2).

Uses scipy equivalents of the reference's skimage calls:
* ``label`` → ``scipy.ndimage.label`` with an 8-connected structure;
* ``binary_erosion``/``binary_dilation`` (cross footprint) →
  ``scipy.ndimage`` with border_value 1/0 (skimage's pad-with-max/min).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.signal import savgol_filter, find_peaks

CROSS = ndimage.generate_binary_structure(2, 1)
EIGHT = np.ones((3, 3))


def window_distance_matrix(w):
    x = np.arange(-w, w + 1)
    dx, dy = np.meshgrid(x, x)
    return np.sqrt(dx**2 + dy**2)


def opening(mask):
    m = ndimage.binary_erosion(mask, structure=CROSS, border_value=1)
    return ndimage.binary_dilation(m, structure=CROSS, border_value=0)


def extract_label(labelled, r, c, w, dist):
    sub = labelled[r - w : r + w + 1, c - w : c + w + 1]
    m = sub != 0
    if m.any():
        return sub[m][np.argmin(dist[m])]
    return None


def find_threshold_index(extents):
    """extents: (T, F). Returns list of per-fire indices (None = no plume)."""
    out = []
    for e in extents.T:
        null = e[:-1] == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            ratios = e[1:] / e[:-1]
        ratios[null] = np.nan
        if np.all(np.isnan(ratios)):
            out.append(None)
            continue
        argmax = np.nanargmax(ratios)
        if np.any(np.isnan(ratios)):
            if argmax == np.where(np.isnan(ratios))[0][-1] + 1:
                out.append(None)
                continue
        if argmax == ratios.size - 1:  # intended last-entry rejection
            out.append(None)
        else:
            out.append(int(argmax))
    return out


def check_plume_profile(dists, coords, aod, region_bbox, cfg):
    small_axis = coords[int(np.argmin(dists))]
    dx = small_axis[0][1] - small_axis[1][1]
    dy = small_axis[0][0] - small_axis[1][0]
    with np.errstate(divide="ignore", invalid="ignore"):
        m = dy / dx
    b = small_axis[0][0] - small_axis[0][1] * m
    min_r, min_c, max_r, max_c = region_bbox
    x = np.linspace(min_c, max_c, cfg.n_transect)
    y = m * x + b
    keep = (y > min_r) & (y < max_r)
    y, x = y[keep], x[keep]
    interp = ndimage.map_coordinates(aod, (y, x), order=1)
    smoothed = savgol_filter(interp, cfg.savgol_window, cfg.savgol_polyorder)
    peaks, _ = find_peaks(smoothed)
    return len(peaks) <= cfg.max_peaks


def assess_plume(aod, labelled, label_for_fire, cfg):
    if label_for_fire is None:
        return None, None
    plume_mask = labelled == label_for_fire
    area = int(plume_mask.sum())
    if area == 0 or area < cfg.min_plume_pixels or area > cfg.max_plume_pixels:
        return None, None
    if aod[plume_mask].max() < cfg.max_lim:
        return None, None
    yx = np.array(np.where(plume_mask == 1))
    eigvals, eigvecs = np.linalg.eig(np.cov(yx))
    center = np.mean(yx, axis=-1)
    dists, coords = [], []
    for val, vec in zip(eigvals, eigvecs.T):
        v1, v2 = center + val * vec, center - val * vec
        dists.append(np.linalg.norm(v1 - v2))
        coords.append([v1, v2])
    big, small = max(dists), min(dists)
    if small == 0 or big / small < cfg.side_ratio:
        return None, None
    ys, xs = np.where(plume_mask)
    bbox = (ys.min(), xs.min(), ys.max() + 1, xs.max() + 1)
    try:
        ok = check_plume_profile(dists, coords, aod, bbox, cfg)
    except Exception:
        return None, None
    if not ok:
        return None, None
    return plume_mask, bbox


def find_plume_mask(aod, masks, index, fire_rows, fire_cols, fire_id, cfg,
                    dist):
    labelled, _ = ndimage.label(masks[index], structure=EIGHT)
    lab = extract_label(labelled, fire_rows[fire_id], fire_cols[fire_id],
                        cfg.win_half, dist)
    return assess_plume(aod, labelled, lab, cfg)


def oracle_identify(aod, fire_rows, fire_cols, cfg):
    """Returns per-fire dicts: threshold index, chosen mask, bbox (or None)."""
    thresholds = np.asarray(cfg.thresholds)
    dist = window_distance_matrix(cfg.win_half)
    masks = [opening(aod > t) for t in thresholds]

    extents = np.zeros((len(thresholds), len(fire_rows)))
    for ti, m in enumerate(masks):
        labelled, _ = ndimage.label(m, structure=EIGHT)
        for fi, (r, c) in enumerate(zip(fire_rows, fire_cols)):
            lab = extract_label(labelled, r, c, cfg.win_half, dist)
            if lab is not None:
                extents[ti, fi] = (labelled == lab).sum()

    t_idx = find_threshold_index(extents)
    results = []
    for fi, ti in enumerate(t_idx):
        if ti is None:
            results.append(None)
            continue
        mask_a, bbox_a = find_plume_mask(aod, masks, ti, fire_rows, fire_cols,
                                         fi, cfg, dist)
        ti_b = ti - 1  # python wrap: -1 reads the last mask, like the ref
        mask_b, bbox_b = find_plume_mask(aod, masks, ti_b, fire_rows,
                                         fire_cols, fi, cfg, dist)
        if mask_a is None and mask_b is None:
            results.append(None)
            continue
        if mask_a is not None and mask_b is not None:
            if mask_a.sum() > mask_b.sum():
                mask, bbox = mask_a, bbox_a
            else:
                mask, bbox = mask_b, bbox_b
        elif mask_a is None:
            mask, bbox = mask_b, bbox_b
        else:
            mask, bbox = mask_a, bbox_a
        results.append(dict(t_index=ti, mask=mask, bbox=bbox,
                            extents=extents[:, fi]))
    return results, extents
