"""Threshold-sweep ("region growth") detector — the reference's
``plume_identifier_rg.py`` re-expressed on the device sweep pipeline.

Host side: fire subsetting/clustering/location and convex-hull extraction
(ragged); device side: the full 20-threshold sweep, CCL, extents, threshold
index and acceptance gates as one jitted program
(:mod:`plumekit.identify.pipeline`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import jax.numpy as jnp

from plumekit.config.identify import RGIdentifyConfig
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.identify.pipeline import (SweepStatics,
                                         cached_sweep_identifier,
                                         validate_descending_thresholds)
from plumekit.io.fires import subset_fires_to_image
from plumekit.ops.cluster import mean_cluster_positions
from plumekit.ops.geometry import convex_hull_vertices_host
from plumekit.utils import get_logger

logger = get_logger(__name__)


def _statics(cfg: RGIdentifyConfig) -> SweepStatics:
    return SweepStatics(
        win_half=cfg.win_half,
        min_plume_pixels=cfg.min_plume_pixels,
        max_plume_pixels=cfg.max_plume_pixels,
        max_lim=cfg.max_lim,
        axis_ratio=cfg.side_ratio,
        max_peaks=cfg.max_peaks,
        n_transect=cfg.n_transect,
        savgol_window=cfg.savgol_window,
        savgol_polyorder=cfg.savgol_polyorder,
        check_null=False,
        use_mask_b=True,
        pick_larger_mask=cfg.compat.pick_larger_mask,
        reject_last_threshold=cfg.compat.reject_last_threshold,
        dilate_plume_px=0,
    )


def _prep_fires(lat, lon, date_to_find, fire_df, cfg, capacity=None):
    """Host fire prep shared by the serial and batched drivers: subset to
    the scene/date, cluster, locate on the grid, pad to capacity.
    ``capacity=None`` buckets to this scene's own count (the serial
    driver); the batched driver passes a shared capacity so per-scene
    arrays stack."""
    fire_subset = subset_fires_to_image(lat, lon, fire_df, date_to_find,
                                        min_frp=cfg.min_frp)
    logger.info("...extracted %d fires for image roi", len(fire_subset))

    if len(fire_subset):
        clusters = mean_cluster_positions(fire_subset, cfg.cluster_dist_km)
        rows, cols = locate_fires_in_image(
            clusters.latitude, clusters.longitude, lat, lon, cfg.win_half
        )
    else:
        rows = cols = np.zeros((0,), np.int32)
    logger.info("...located %d fire clusters on grid", len(rows))
    if len(rows) > cfg.max_fires:
        logger.warning(
            "fire clusters (%d) exceed capacity (%d); truncating",
            len(rows), cfg.max_fires,
        )
    # bucketed capacity (round 5): the sweep's per-fire phases cost
    # padded-F work; see locate.fire_bucket
    if capacity is None:
        return pad_fires(rows, cols, cfg.max_fires, bucket=True)
    return pad_fires(rows, cols, capacity)


def identify(
    aod: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    date_to_find,
    fire_df: pd.DataFrame,
    cfg: RGIdentifyConfig = RGIdentifyConfig(),
) -> Tuple[pd.DataFrame, pd.DataFrame, dict]:
    """Per-scene identification (``plume_identifier_rg.py:460-506`` call
    order). Returns ``(aod_df, hull_df, device_out)``; dataframes use the
    reference's column names so downstream tooling (selector) is drop-in.
    Empty results yield empty dataframes (the reference returns ``(None,
    None)`` after an exception; SURVEY.md bug #7 — we fail loudly instead of
    swallowing)."""
    f_rows, f_cols, f_valid = _prep_fires(lat, lon, date_to_find, fire_df,
                                          cfg)
    thresholds = validate_descending_thresholds(cfg.thresholds)

    fn = cached_sweep_identifier(_statics(cfg))
    aod_j = jnp.asarray(aod, dtype=jnp.float32)
    out = fn(
        aod_j, aod_j, jnp.zeros(aod.shape, bool), jnp.asarray(thresholds),
        jnp.asarray(f_rows), jnp.asarray(f_cols), jnp.asarray(f_valid),
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    return _scene_results(out, lat, lon)


def _scene_results(out: dict, lat, lon):
    """Host post-processing shared by the serial and batched drivers."""
    masks: dict = {}
    aod_df, hull_df = build_scene_dataframes(out, lat, lon, masks_out=masks)
    # cache the per-id masks gathered during the single hull walk so
    # plume_masks(out) need not repeat the host-side nonzero + Qhull pass
    # per plume (build_features calls both on every granule). Restrict to
    # the ids that survived the dataframe dedup — plume_masks' contract is
    # "every plume that appears in the scene dataframes", and an orphan
    # key would surface as a phantom plume in the saved *_masks.npz
    kept = set(int(i) for i in aod_df.id) if len(aod_df) else set()
    out["plume_masks"] = {pid: m for pid, m in masks.items() if pid in kept}
    return aod_df, hull_df, out


def identify_batch(
    scenes,
    fire_df: pd.DataFrame,
    cfg: RGIdentifyConfig = RGIdentifyConfig(),
):
    """G same-shape scenes identified in ONE dispatched program.

    ``scenes`` is a list of ``(aod, lat, lon, date_to_find)``; all AOD
    arrays must share one shape (the program is compiled per shape).
    Returns a list of per-scene ``(aod_df, hull_df, device_out)`` —
    bit-identical to calling :func:`identify` per scene (same sweep body,
    ``lax.map``-ped; parity-tested). On the tunneled v5e the fixed
    per-program dispatch tax amortises across the group: 72.9 → 65.2
    ms/scene at G=8 (BASELINE.md round-3 multi-scene row); the reference's
    driver is the strictly serial loop at
    ``plume_identifier_rg.py:537-576``."""
    from plumekit.identify.pipeline import cached_batch_sweep_identifier

    scenes = list(scenes)   # tolerate generators: iterated several times
    if not scenes:
        raise ValueError("identify_batch got no scenes")
    shapes = {s[0].shape for s in scenes}
    if len(shapes) != 1:
        raise ValueError(
            f"identify_batch needs same-shape scenes, got {sorted(shapes)}")
    # one SHARED bucketed capacity across the group (per-scene buckets
    # would not stack); valid fires sit in the leading slots by the
    # pad_fires contract, so truncation to the shared bucket is lossless
    preps = [_prep_fires(lat, lon, date, fire_df, cfg,
                         capacity=cfg.max_fires)
             for _aod, lat, lon, date in scenes]
    from plumekit.identify.locate import fire_bucket

    shared = fire_bucket(max(int(p[2].sum()) for p in preps),
                         cfg.max_fires)
    preps = [(p[0][:shared], p[1][:shared], p[2][:shared]) for p in preps]
    thresholds = validate_descending_thresholds(cfg.thresholds)
    fn = cached_batch_sweep_identifier(_statics(cfg))
    aods = jnp.asarray(np.stack([s[0] for s in scenes]), jnp.float32)
    outs = fn(
        aods,
        jnp.zeros(aods.shape, bool),
        jnp.asarray(thresholds),
        jnp.asarray(np.stack([p[0] for p in preps])),
        jnp.asarray(np.stack([p[1] for p in preps])),
        jnp.asarray(np.stack([p[2] for p in preps])),
    )
    outs = {k: np.asarray(v) for k, v in outs.items()}
    return [
        _scene_results({k: v[i] for k, v in outs.items()},
                       scenes[i][1], scenes[i][2])
        for i in range(len(scenes))
    ]


def _iter_valid_plumes(out: dict):
    """Yield ``(plume_id, fire_index, mask, hull_rows, hull_cols)`` over
    accepted fires, skipping plumes with no 2-D hull — the SINGLE
    id-assignment walk shared by :func:`build_scene_dataframes` and
    :func:`plume_masks`, so curated-mask artifacts are keyed by exactly the
    ids the selector's hull CSVs carry."""
    from scipy.spatial import QhullError

    plume_id = 0
    for f in np.nonzero(out["accepted"])[0]:
        mask = out["mask"][f]
        ys, xs = np.nonzero(mask)
        if ys.size < 3:
            continue
        points = np.column_stack([ys, xs])
        try:
            verts = convex_hull_vertices_host(points)
        except QhullError:
            # degenerate (collinear) plume: no 2-D hull exists — log the
            # drop so scene plume counts do not shift silently (a broader
            # except here would also have masked real defects, the exact
            # SURVEY bug-#7 pattern this module documents avoiding)
            logger.info("plume at fire %d dropped: degenerate hull "
                        "(%d collinear pixels)", int(f), ys.size)
            continue
        yield plume_id, int(f), mask, points[verts, 0], points[verts, 1]
        plume_id += 1


def plume_masks(out: dict) -> dict:
    """``{plume_id: (H, W) bool mask}`` for every plume that appears in the
    scene dataframes — the device detector's exact pixel support, keyed to
    match ``hull_df.id``. This is plumekit's sharper curated artifact: the
    reference pipeline only persists convex hulls (``plume_selector.py:
    229-233``), so curated training targets are convex FILLS of the plume;
    keeping the device mask drops false plumes without coarsening kept
    ones (measured: BASELINE.md round-3 false-plume rows)."""
    if "plume_masks" in out:  # cached by identify()'s single walk
        return out["plume_masks"]
    return {pid: mask for pid, _f, mask, _hy, _hx in _iter_valid_plumes(out)}


def build_scene_dataframes(out: dict, lat: np.ndarray, lon: np.ndarray,
                           dedup: bool = True, masks_out: dict = None):
    """Assemble the reference's two outputs from the device result:

    * ``aod_df``: one row per accepted plume with pixel extent, bbox, AOD
      mean/sd, ``bg_aod_level`` = chosen threshold *index*
      (``plume_identifier_rg.py:425-437`` stores the index, not the value);
    * ``hull_df``: convex-hull vertices with pixel and geographic coords
      (``:411-420``, host-side scipy hulls).

    ``dedup`` reproduces the trailing duplicate drop (``:453-455``): rows
    identical in all stats (two fires claiming one plume) collapse to the
    first id. ``masks_out``, if given, is filled ``{plume_id: mask}`` during
    the same walk (avoids a second hull pass for the curated-mask artifact).
    """
    aod_rows, hull_parts = [], []
    for plume_id, f, mask, hy, hx in _iter_valid_plumes(out):
        if masks_out is not None:
            masks_out[plume_id] = mask
        hull_parts.append(
            pd.DataFrame(
                {
                    "id": np.full(hy.size, plume_id, dtype=float),
                    "hull_lats": lat[hy, hx],
                    "hull_lons": lon[hy, hx],
                    "hull_x": hx,
                    "hull_y": hy,
                }
            )
        )
        min_r, min_c, max_r, max_c = out["bbox"][f]
        aod_rows.append(
            {
                "id": plume_id,
                "plume_pixel_extent": int(out["area"][f]),
                "plume_min_row": int(min_r),
                "plume_max_row": int(max_r),
                "plume_min_col": int(min_c),
                "plume_max_col": int(max_c),
                "plume_aod_mean": float(out["aod_mean"][f]),
                "plume_aod_sd": float(out["aod_sd"][f]),
                "bg_aod_level": int(out["t_index"][f]),
            }
        )

    aod_df = pd.DataFrame(
        aod_rows,
        columns=[
            "id", "plume_pixel_extent", "plume_min_row", "plume_max_row",
            "plume_min_col", "plume_max_col", "plume_aod_mean",
            "plume_aod_sd", "bg_aod_level",
        ],
    )
    hull_df = (
        pd.concat(hull_parts, ignore_index=True)
        if hull_parts
        else pd.DataFrame(
            columns=["id", "hull_lats", "hull_lons", "hull_x", "hull_y"]
        )
    )
    if dedup and len(aod_df):
        deduped = aod_df.set_index("id").drop_duplicates().reset_index()
        hull_df = hull_df[hull_df.id.isin(deduped.id)]
        aod_df = deduped
    return aod_df, hull_df
