"""Clean-room NumPy/scipy oracle of the reference basic detector
(``plume_identifier_basic.py``): 21×21 background-ratio fire screen, fixed
0.2 threshold, opening, CCL, nearest-label association, duplicate-label and
size gates, bbox extraction."""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from oracle_rg import EIGHT, extract_label, opening, window_distance_matrix


def fires_near_plumes(aod, rows, cols, cfg):
    """Max/min 3×3-subwindow-mean ratio screen
    (``plume_identifier_basic.py:164-205``)."""
    w = cfg.win_half
    size = 2 * w + 1
    step = size // 3
    keep_r, keep_c = [], []
    for r, c in zip(rows, cols):
        min_r = max(r - w, 0)
        max_r = min(r + w + 1, aod.shape[0])
        min_c = max(c - w, 0)
        max_c = min(c + w + 1, aod.shape[1])
        win = aod[min_r:max_r, min_c:max_c]
        if win.size != size * size:
            continue
        means = [
            win[i : i + step, j : j + step].mean()
            for i in (0, step, 2 * step)
            for j in (0, step, 2 * step)
        ]
        mn, mx = min(means), max(means)
        with np.errstate(divide="ignore"):
            ratio = np.inf if mn == 0 else mx / mn
        if ratio > cfg.aod_ratio_limit:
            keep_r.append(r)
            keep_c.append(c)
    return keep_r, keep_c


def oracle_basic_identify(aod, rows, cols, cfg):
    """Returns (plume bbox dict, labelled image) with the reference
    semantics (``plume_identifier_basic.py:220-269``)."""
    dist = window_distance_matrix(cfg.win_half)
    rows_p, cols_p = fires_near_plumes(aod, rows, cols, cfg)

    mask = opening(aod >= cfg.aod_min_limit)
    labelled, _ = ndimage.label(mask, structure=EIGHT)

    labels = []
    for r, c in zip(rows_p, cols_p):
        lab = extract_label(labelled, r, c, cfg.win_half, dist)
        if lab is not None:
            labels.append(lab)
    final = [l for l in labels if np.sum(np.asarray(labels) == l) < 2]

    out = labelled.copy()
    for l in np.unique(labelled):
        if l == 0:
            continue
        size = (labelled == l).sum()
        if l not in final or size > cfg.max_plume_pixels or \
                size < cfg.min_plume_pixels:
            out[labelled == l] = 0

    plume_dict = {}
    relabelled, n = ndimage.label(out > 0, structure=EIGHT)
    for i in range(1, n + 1):
        ys, xs = np.nonzero(relabelled == i)
        plume_dict[i] = {
            "min_r": int(ys.min()), "min_c": int(xs.min()),
            "max_r": int(ys.max()) + 1, "max_c": int(xs.max()) + 1,
        }
    return plume_dict, out
