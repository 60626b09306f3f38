"""Fixed-threshold detector — the reference's ``plume_identifier_basic.py``.

One device program per scene shape: the 21×21 background-ratio fire screen
(``:164-205``), the 0.2-threshold mask + opening + CCL (``:228-234``), the
per-fire nearest-label association with duplicate-label and size gates
(``:208-258``), and bbox extraction (``:263-269``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Tuple

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
from jax import lax

from plumekit.config.identify import BasicIdentifyConfig
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.io.fires import subset_fires_to_image
from plumekit.ops.ccl import ccl_backend, connected_components
from plumekit.ops.morphology import binary_opening_cross
from plumekit.ops.segment import label_window_nearest, masked_bbox
from plumekit.ops.cluster import mean_cluster_positions
from plumekit.utils import get_logger

logger = get_logger(__name__)


@lru_cache(maxsize=8)
def _make_program(cfg: BasicIdentifyConfig):
    w = cfg.win_half
    size = 2 * w + 1
    step = size // 3  # int(21/3) = 7 (plume_identifier_basic.py:189)

    def fire_near_plume(aod, r, c):
        """Max/min 3×3-subwindow-mean ratio screen (``:164-205``). The
        reference skips edge-clipped windows; callers pre-filter fires to the
        full-window interior, making the dynamic_slice always in-bounds."""
        win = lax.dynamic_slice(aod, (r - w, c - w), (size, size))
        sub = win[: 3 * step, : 3 * step].reshape(3, step, 3, step)
        means = sub.mean(axis=(1, 3))
        min_m = jnp.min(means)
        max_m = jnp.max(means)
        # reference semantics (plume_identifier_basic.py:196-205): a zero
        # background divides to inf (kept); a NEGATIVE background (null
        # -999 pixels in the window) makes the ratio negative → dropped —
        # this is how null-contaminated windows fail the screen
        ratio = jnp.where(min_m == 0, jnp.inf,
                          max_m / jnp.where(min_m == 0, 1.0, min_m))
        return ratio > cfg.aod_ratio_limit

    def program(aod, fire_rows, fire_cols, fire_valid):
        near = jax.vmap(lambda r, c: fire_near_plume(aod, r, c))(
            fire_rows, fire_cols
        )
        near &= fire_valid

        mask = aod >= cfg.aod_min_limit
        opened = binary_opening_cross(mask)
        from plumekit.ops.pallas.ccl_sweep import (
            multi_threshold_ccl, sweep_fits_vmem)

        if ccl_backend() == "pallas" and sweep_fits_vmem(*opened.shape):
            labels = multi_threshold_ccl(opened[None], nested=False)[0]
        else:
            labels = connected_components(opened, connectivity=2)

        lab_f, found = jax.vmap(
            lambda r, c: label_window_nearest(labels, r, c, w)
        )(fire_rows, fire_cols)
        # the reference only appends found labels before duplicate counting
        # (plume_identifier_basic.py:238-242)
        live = near & found
        lab_eff = jnp.where(live, lab_f, -1)
        counts = jnp.sum(
            (lab_eff[:, None] == lab_eff[None, :]) & live[None, :], axis=1
        )
        keep_f = live & (counts < 2)

        # per-fire component size as a fused masked count (the former
        # H·W+1-segment size map lowers to a giant scatter on TPU)
        area_f = jnp.sum(labels[None, :, :] == lab_eff[:, None, None],
                         axis=(1, 2), dtype=jnp.int32)
        keep_f &= area_f <= cfg.max_plume_pixels
        keep_f &= area_f >= cfg.min_plume_pixels

        # no first-occurrence dedup needed: the counts < 2 gate above
        # already removed EVERY pair of live fires sharing a label, so no
        # two keep_f fires can still reference the same component
        plume_f = keep_f

        fire_masks = jnp.where(
            plume_f[:, None, None], labels[None] == lab_f[:, None, None],
            False,
        )
        bboxes = jnp.stack(masked_bbox(fire_masks), axis=-1)  # (F, 4)
        plume_image = jnp.where(fire_masks.any(axis=0), labels, 0)
        return dict(
            near=near,
            plume=plume_f,
            label=lab_f,
            area=area_f,
            bbox=bboxes,
            plume_image=plume_image,
        )

    return jax.jit(program)


def identify(
    aod: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    date_to_find,
    fire_df: pd.DataFrame,
    cfg: BasicIdentifyConfig = BasicIdentifyConfig(),
) -> Tuple[Dict[int, dict], np.ndarray]:
    """Returns ``(plume_roi_dict, plume_image)`` like the reference's
    ``identify`` (``plume_identifier_basic.py:272-318``): a dict of
    ``{plume_id: {min_r, min_c, max_r, max_c}}`` and the labelled image of
    surviving plumes."""
    fire_subset = subset_fires_to_image(
        lat, lon, fire_df, date_to_find, min_frp=cfg.min_frp
    )
    if len(fire_subset):
        clusters = mean_cluster_positions(fire_subset, cfg.cluster_dist_km)
        # basic has no explicit edge filter; its full-window test drops the
        # same fires (plume_identifier_basic.py:184) — margin w+1 covers both
        rows, cols = locate_fires_in_image(
            clusters.latitude, clusters.longitude, lat, lon, cfg.win_half
        )
    else:
        rows = cols = np.zeros((0,), np.int32)

    if len(rows) > cfg.max_fires:
        # pad_fires truncates silently by contract; warn like rg/gaussian
        logger.warning(
            "fire clusters (%d) exceed capacity (%d); truncating",
            len(rows), cfg.max_fires)
    f_rows, f_cols, f_valid = pad_fires(rows, cols, cfg.max_fires,
                                        bucket=True)
    fn = _make_program(cfg)
    out = fn(
        jnp.asarray(aod, jnp.float32), jnp.asarray(f_rows),
        jnp.asarray(f_cols), jnp.asarray(f_valid),
    )
    out = {k: np.asarray(v) for k, v in out.items()}

    plume_dict: Dict[int, dict] = {}
    pid = 1
    for f in np.nonzero(out["plume"])[0]:
        min_r, min_c, max_r, max_c = out["bbox"][f]
        plume_dict[pid] = {
            "min_r": int(min_r), "min_c": int(min_c),
            "max_r": int(max_r), "max_c": int(max_c),
        }
        pid += 1
    return plume_dict, out["plume_image"]
