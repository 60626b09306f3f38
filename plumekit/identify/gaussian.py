"""Multi-scale, multi-orbit detector — the reference's
``plume_identifier_gaussian_profile.py`` on the device sweep pipeline.

Differences from rg, all reproduced (SURVEY.md §2 row "gaussian-profile"):
every orbit layer is processed; nulls are in-painted before detection
(device jump-flooding instead of a host kd-tree); fires are clustered by
rasterise→label→remove-small instead of DBSCAN; three threshold sweeps run
(steps 0.02/0.03/0.04 to maxima 0.5/0.75/1.0 — all length 25, so one compiled
program serves all three); extra gates: ≤20% null pixels, axis ratio ≥ 8,
≤3 transect peaks; the final mask is buffered by a 5×5 dilation before hull
extraction; only hulls are emitted (no aod stats frame).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import jax.numpy as jnp

from plumekit.config.identify import GaussianIdentifyConfig
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.identify.pipeline import (SweepStatics,
                                         cached_sweep_identifier,
                                         validate_descending_thresholds)
from plumekit.identify.rg import build_scene_dataframes
from plumekit.io.fires import subset_fires_to_image
from plumekit.io.granule import Granule
from plumekit.ops.cluster import raster_cluster_centroids
from plumekit.ops.inpaint import nearest_fill
from plumekit.utils import get_logger

logger = get_logger(__name__)


def _statics(cfg: GaussianIdentifyConfig) -> SweepStatics:
    return SweepStatics(
        win_half=cfg.win_half,
        min_plume_pixels=cfg.min_plume_pixels,
        max_plume_pixels=cfg.max_plume_pixels,
        max_lim=cfg.max_lim,
        axis_ratio=cfg.min_axis_ratio,
        max_peaks=cfg.max_peaks,
        n_transect=cfg.n_transect,
        savgol_window=0,                       # unsmoothed transect
        check_null=True,
        max_invalid_frac=cfg.max_invalid_frac,
        use_mask_b=False,                      # gaussian vets only the chosen index
        reject_last_threshold=cfg.compat.reject_last_threshold,
        dilate_plume_px=cfg.dilate_plume_px,
    )


def load_fires(lat, lon, fire_df, date_to_find, cfg: GaussianIdentifyConfig):
    """Subset (no FRP gate) + locate — ``load_fires``
    (``plume_identifier_gaussian_profile.py:526-539``)."""
    sub = subset_fires_to_image(lat, lon, fire_df, date_to_find)
    if not len(sub):
        return np.zeros((0,), np.int32), np.zeros((0,), np.int32)
    return locate_fires_in_image(
        sub.latitude, sub.longitude, lat, lon, cfg.win_half
    )


def cluster_fire_centroids(shape, fire_rows, fire_cols,
                           cfg: GaussianIdentifyConfig):
    """Fire clustering (pad + rasterised CCL centroids) — depends only on
    the fire table and grid shape, so multi-orbit granules compute it ONCE
    (a per-layer recompute would dispatch an identical CCL program per
    layer; op count is the dominant cost on this platform)."""
    if len(fire_rows) > cfg.max_fires:
        logger.warning(
            "raw fires (%d) exceed capacity (%d); truncating before "
            "clustering", len(fire_rows), cfg.max_fires,
        )
    f_rows, f_cols, f_valid = pad_fires(fire_rows, fire_cols, cfg.max_fires)
    return raster_cluster_centroids(
        shape, jnp.asarray(f_rows), jnp.asarray(f_cols),
        jnp.asarray(f_valid), cfg.min_fire_cluster_px,
    )


def identify_layer(
    aod: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    fire_rows: np.ndarray,
    fire_cols: np.ndarray,
    cfg: GaussianIdentifyConfig = GaussianIdentifyConfig(),
    clusters=None,
) -> pd.DataFrame:
    """One orbit layer → hull dataframe
    (``plume_identifier_gaussian_profile.py:464-518`` call order).
    ``clusters``: precomputed :func:`cluster_fire_centroids` result (the
    multi-orbit driver passes it; standalone calls compute it here)."""
    null_mask = aod == cfg.null_value
    aod_i = nearest_fill(
        jnp.asarray(aod, jnp.float32), jnp.asarray(null_mask)
    )

    cr, cc, cvalid = (clusters if clusters is not None
                      else cluster_fire_centroids(
                          aod.shape, fire_rows, fire_cols, cfg))

    fn = cached_sweep_identifier(_statics(cfg))
    df_list: List[pd.DataFrame] = []
    min_id = 0
    null_j = jnp.asarray(null_mask)
    for thresholds in cfg.threshold_sets():
        thr = jnp.asarray(validate_descending_thresholds(thresholds))
        out = fn(aod_i, aod_i, null_j, thr, cr, cc, cvalid)
        out = {k: np.asarray(v) for k, v in out.items()}
        _, hull_df = build_scene_dataframes(out, lat, lon, dedup=False)
        if len(hull_df):
            hull_df["id"] = hull_df["id"] + min_id
            min_id = int(hull_df.id.max()) + 1
        df_list.append(hull_df)
    return pd.concat(df_list, ignore_index=True)


def identify_granule(
    granule: Granule,
    fire_df: pd.DataFrame,
    date_to_find,
    cfg: GaussianIdentifyConfig = GaussianIdentifyConfig(),
) -> pd.DataFrame:
    """All orbit layers of a granule → combined hull dataframe with the
    ``datetime`` column (``plume_identifier_gaussian_profile.py:606-644``).
    Scenes with fewer than ``min_fires_per_scene`` located fires are skipped
    (``:598-600``)."""
    fire_rows, fire_cols = load_fires(
        granule.lat, granule.lon, fire_df, date_to_find, cfg
    )
    if len(fire_rows) < cfg.min_fires_per_scene:
        logger.info("too few fires (%d) — skipping scene", len(fire_rows))
        return pd.DataFrame(
            columns=["id", "hull_lats", "hull_lons", "hull_x", "hull_y",
                     "datetime"]
        )

    # fire clustering depends only on the fire table + grid: once per
    # granule, not once per orbit layer
    clusters = cluster_fire_centroids(
        granule.shape, fire_rows, fire_cols, cfg)
    parts = []
    for ts, aod in granule.layers.items():
        hull_df = identify_layer(
            aod, granule.lat, granule.lon, fire_rows, fire_cols, cfg,
            clusters=clusters,
        )
        if hull_df.empty:
            continue
        hull_df["datetime"] = ts
        parts.append(hull_df)
    if not parts:
        return pd.DataFrame(
            columns=["id", "hull_lats", "hull_lons", "hull_x", "hull_y",
                     "datetime"]
        )
    return pd.concat(parts, ignore_index=True)
