"""Curated-label training data — closes the identify → curation → training
loop the reference exists for.

The reference's selector writes kept hulls to ``reduced/plume/hull``
(``plume_selector.py:229-233``) and ``filepaths.py:32`` reserves
``interim/model_input`` for model-ready data — but the step that turns
curated hulls into training targets was never committed (the U-Net half of
the repo is absent, SURVEY.md §0). plumekit supplies it:

* :func:`rasterize_hulls` fills curated convex hulls back into a pixel mask
  (the inverse of hull extraction, same Delaunay containment as the
  selector's ``in_hull``, ``plume_selector.py:88-99``);
* :func:`build_model_data` joins curated hull CSVs with their granules and
  the fire table and writes model-ready (channels, mask) samples under
  ``model_data_dir`` (the ``prepare_model_data`` CLI step);
* :func:`make_curated_dataset` feeds those samples to the training loop
  (``train_model --curated``).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd

from plumekit.config import PathsConfig
from plumekit.io.granule import Granule, find_granule, load_granule
from plumekit.train.data import GranuleSample
from plumekit.utils import get_logger

logger = get_logger(__name__)


def rasterize_hulls(hull_df: pd.DataFrame, shape) -> np.ndarray:
    """Union of filled convex hulls (one per plume ``id``) as a bool mask.

    ``hull_df`` rows carry hull vertices in pixel space (``hull_x`` = col,
    ``hull_y`` = row, the schema the identify detectors write). Containment
    uses Delaunay ``find_simplex >= 0`` over the hull's bbox subgrid — the
    same test the selector applies when sampling in-plume AOD — so a mask →
    hull → mask round trip returns exactly the convex fill of the plume.
    Degenerate hulls (<3 vertices or collinear) are skipped.
    """
    from scipy.spatial import Delaunay, QhullError

    h, w = shape
    mask = np.zeros((h, w), dtype=bool)
    for _pid, g in hull_df.groupby("id"):
        hx = g.hull_x.to_numpy(dtype=np.float64)
        hy = g.hull_y.to_numpy(dtype=np.float64)
        if len(hx) < 3 or np.isnan(hx).any() or np.isnan(hy).any():
            continue
        x0 = int(np.clip(np.floor(hx.min()), 0, w - 1))
        x1 = int(np.clip(np.ceil(hx.max()) + 1, 1, w))
        y0 = int(np.clip(np.floor(hy.min()), 0, h - 1))
        y1 = int(np.clip(np.ceil(hy.max()) + 1, 1, h))
        yy, xx = np.mgrid[y0:y1, x0:x1]
        pts = np.column_stack([xx.ravel(), yy.ravel()])
        try:
            inside = Delaunay(np.column_stack([hx, hy])).find_simplex(pts) >= 0
        except QhullError:
            continue
        mask[yy.ravel()[inside], xx.ravel()[inside]] = True
    return mask


def granule_to_channels(granule: Granule, ts: str,
                        fire_df: Optional[pd.DataFrame],
                        date=None) -> np.ndarray:
    """(H, W, 2) AOD + fire-density channels for one orbit layer — the same
    input bands the synthetic trainer uses (``train/data.py``)."""
    from plumekit.identify.locate import locate_fires_in_image
    from plumekit.io.fires import subset_fires_to_image

    from plumekit.train.data import assemble_channels

    from plumekit.io.granule import resolve_layer

    # shared strict resolution: the "layer0" sentinel (rg/basic ran on
    # first_layer) and real orbit timestamps resolve; an unknown timestamp
    # on a multi-orbit granule raises rather than silently pairing the
    # mask with the wrong orbit's AOD
    aod = resolve_layer(granule, ts)
    rows: np.ndarray = np.zeros(0, np.int32)
    cols: np.ndarray = np.zeros(0, np.int32)
    if fire_df is not None and len(fire_df):
        sub = (subset_fires_to_image(granule.lat, granule.lon, fire_df, date)
               if date is not None else fire_df)
        rows, cols = locate_fires_in_image(
            sub.latitude.to_numpy(), sub.longitude.to_numpy(),
            granule.lat, granule.lon, win_half=0, edge_margin=0,
        )
    return assemble_channels(aod, rows, cols)


def masks_for_kept_ids(mask_npz_path: str, kept_ids,
                       shape) -> Optional[np.ndarray]:
    """Union of the per-plume device masks for the curated-kept ids, or
    ``None`` when the npz lacks any of them (caller falls back to hulls).
    ``build_features`` writes the npz keyed by the same ids the hull CSVs
    carry (``identify.rg.plume_masks``)."""
    with np.load(mask_npz_path) as data:
        union = np.zeros(shape, dtype=bool)
        for pid in kept_ids:
            key = str(int(pid))
            if key not in data:
                logger.warning("%s: kept id %s missing from mask npz — "
                               "falling back to hulls", mask_npz_path, key)
                return None
            union |= data[key].astype(bool)
    return union


def build_model_data(
    paths: PathsConfig,
    fire_csv: Optional[str] = None,
    out_dir: Optional[str] = None,
    use_masks: bool = True,
    uncurated: bool = False,
) -> List[str]:
    """For every curated hull CSV (``reduced/plume/hull/*_extent.csv``),
    rasterise kept plumes per orbit layer and write a model-ready npz
    (``channels`` (H, W, 2), ``mask`` (H, W)) under ``model_data_dir``.
    Returns the written paths.

    With ``use_masks`` (default), a granule whose ``plume_mask_dir`` npz
    exists gets its training mask from the union of the kept plumes'
    DEVICE masks instead of convex-hull fills — plumekit's sharper curated
    artifact (hull fills coarsen thin plumes: measured −0.02 IoU clean /
    hull-vs-mask gap in the false-plume regime, BASELINE.md round 3).
    Granules without the npz (or ``use_masks=False``) use the reference's
    hull-rasterisation pathway.

    With ``uncurated``, the FULL identify output (``hull_df_dir``) is used
    instead of the curated reduced set — every detected plume counts as
    kept. This is the raw-weak-label training path for a campaign without
    (or before) human review: on clean-regime synthetic scenes raw weak
    masks score within noise of curated ones; curation pays when the weak
    labeller admits false plumes (docs/quality.md)."""
    from plumekit.io.dates import granule_date
    from plumekit.io.fires import load_fire_csv

    reduced_dir = paths.ensure(
        "hull_df_dir" if uncurated else "reduced_plume_hull_dir")
    maiac_dir = paths.ensure("maiac_dir")
    out_dir = out_dir or paths.ensure("model_data_dir")
    fire_df = None
    if fire_csv is None:
        cand = os.path.join(paths.resolve("fires_dir"), "fires.csv")
        fire_csv = cand if os.path.exists(cand) else None
    if fire_csv is not None:
        fire_df = load_fire_csv(fire_csv)
        if not len(fire_df):          # header-only CSV: same as no fires
            fire_df = None

    written: List[str] = []
    for fname in sorted(os.listdir(reduced_dir)):
        if not fname.endswith("_extent.csv"):
            continue
        hull_df = pd.read_csv(os.path.join(reduced_dir, fname))
        if not len(hull_df):
            continue
        if not {"hull_x", "hull_y"} <= set(hull_df.columns):
            # the basic detector writes bbox-only extent CSVs into the
            # same tree (no hulls to rasterise) — skip, don't KeyError;
            # reachable via the uncurated path over hull_df_dir
            logger.info("%s has no hull columns (basic detector) — "
                        "skipping", fname)
            continue
        base = fname.replace("_extent.csv", "")
        gpath = find_granule(maiac_dir, base)
        if gpath is None:
            logger.warning("no granule for %s — skipping", fname)
            continue
        granule = load_granule(gpath)
        if "datetime" not in hull_df.columns:
            hull_df["datetime"] = next(iter(granule.layers))
        date = None
        if fire_df is not None:
            date = granule_date(base, default=fire_df.date_time.iloc[0])
        mask_npz = os.path.join(paths.resolve("plume_mask_dir"),
                                base + "_masks.npz")
        for ts in hull_df.datetime.unique():
            kept = hull_df[hull_df.datetime == ts]
            mask = None
            src = "hulls"
            if use_masks and os.path.exists(mask_npz):
                mask = masks_for_kept_ids(mask_npz, kept.id.unique(),
                                          granule.shape)
                src = "device masks"
            if mask is None:
                mask = rasterize_hulls(kept, granule.shape)
                src = "hulls"
            channels = granule_to_channels(granule, str(ts), fire_df, date)
            out = os.path.join(out_dir, f"{base}__{ts}.npz")
            np.savez_compressed(out, channels=channels,
                                mask=mask.astype(np.float32))
            written.append(out)
            logger.info("%s: %d plume px (%d plumes, from %s)", out,
                        int(mask.sum()), kept.id.nunique(), src)
    return written


def make_curated_dataset(model_data_dir: str) -> List[GranuleSample]:
    """Load every model-ready npz under ``model_data_dir``."""
    samples: List[GranuleSample] = []
    for fname in sorted(os.listdir(model_data_dir)):
        if not fname.endswith(".npz"):
            continue
        data = np.load(os.path.join(model_data_dir, fname))
        samples.append(GranuleSample(channels=data["channels"],
                                     mask=data["mask"]))
    if not samples:
        raise FileNotFoundError(
            f"no model-ready samples in {model_data_dir}; run "
            "'plumekit prepare_model_data' after curation"
        )
    return samples
