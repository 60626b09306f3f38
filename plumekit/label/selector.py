"""Plume curation — the reference's interactive accept/reject tool
(``plume_selector.py``) decoupled from compute (SURVEY.md §3.4: "control
crosses a *human* boundary").

Three modes over the same core:

* :func:`review_plumes` — pure function: hull dataframe + granule → per-plume
  crops, in-hull AOD samples and the auto-reject verdict; decisions come from
  any callable (tests use deterministic ones);
* batch artifact mode (:func:`export_review_batch`) — writes one PNG + row
  per plume and applies decisions from a CSV, so humans review out-of-band
  (no blocking GUI in the compute path);
* :func:`interactive_review` — matplotlib key-press loop ('1' keep / '0'
  reject) for reference-style sessions (``plume_selector.py:118-134``),
  without the global mutable ``keep`` list (SURVEY.md bug #11).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import numpy as np
import pandas as pd

from plumekit.io.granule import Granule, resolve_layer
from plumekit.utils import get_logger

logger = get_logger(__name__)

#: crop buffer around the hull bbox (``plume_selector.py:56``)
BUFFER_PX = 40
#: AOD histogram bins for the auto-reject rule (``plume_selector.py:133,210``)
HIST_BINS = np.arange(0, 1, 0.02)


def remove_duplicated_plumes(plume_df: pd.DataFrame) -> pd.DataFrame:
    """Drop plumes whose (datetime, rounded centroid) duplicates an earlier
    one (``plume_selector.py:26-49``; the datetime→int mapping hack there is
    unnecessary with modern pandas, semantics preserved)."""
    grouped = (
        plume_df.groupby(["id", "datetime"], sort=True)
        .agg(hull_lats=("hull_lats", "mean"), hull_lons=("hull_lons", "mean"))
        .reset_index()
    )
    non_dup = grouped.round({"hull_lats": 3, "hull_lons": 3}).drop_duplicates(
        ["datetime", "hull_lats", "hull_lons"], keep="first"
    )
    non_dup = non_dup.drop(["hull_lats", "hull_lons"], axis=1)
    return pd.merge(plume_df, non_dup, on=["id", "datetime"], how="inner")


def subset_plume(aod: np.ndarray, plume_df: pd.DataFrame):
    """Crop the AOD to the hull bbox ± buffer, shifting hull coords into crop
    space (``plume_selector.py:53-85`` semantics).

    The reference's four-branch clamp collapses to clip arithmetic: the crop
    window is ``[max(min−B, 0), min(max+B, size))`` per axis and the hull
    shift is always ``−window_start`` — in the clamped-at-0 branch the
    reference leaves coordinates unshifted *because* the window starts at 0,
    so one uniform shift reproduces quirk #12's asymmetric buffer margin
    exactly (nan hulls still propagate to the post-clamp check and bail)."""
    hull_x = plume_df.hull_x.to_numpy(dtype=np.float64)
    hull_y = plume_df.hull_y.to_numpy(dtype=np.float64)
    h, w = aod.shape
    x0 = np.maximum(hull_x.min() - BUFFER_PX, 0)
    y0 = np.maximum(hull_y.min() - BUFFER_PX, 0)
    x1 = np.minimum(hull_x.max() + BUFFER_PX, w)
    y1 = np.minimum(hull_y.max() + BUFFER_PX, h)
    if np.isnan([y0, y1, x0, x1]).any():
        return None, None, None
    return (
        aod[int(y0):int(y1), int(x0):int(x1)],
        hull_x - x0,
        hull_y - y0,
    )


def find_plume_aod(plume_image: np.ndarray, hull_x, hull_y) -> np.ndarray:
    """AOD values of pixels inside the hull (``plume_selector.py:102-116``,
    Delaunay in-hull ≡ convex-polygon containment).

    Deliberate deviation (quirk #13): the reference builds
    ``meshgrid(arange(h), arange(w))`` with the ranges swapped relative to
    their uses, so on non-square crops it silently samples only the
    ``min(h, w)`` square — in-hull pixels beyond that are never histogrammed
    and can flip the zero-bin auto-reject. plumekit samples the full crop
    (the intended behavior); see docs/parity.md."""
    from scipy.spatial import Delaunay

    h, w = plume_image.shape
    yy, xx = np.mgrid[0:h, 0:w]
    pts = np.column_stack([xx.ravel(), yy.ravel()])
    hull = np.column_stack([hull_x, hull_y])
    try:
        inside = Delaunay(hull).find_simplex(pts) >= 0
    except Exception:
        return np.zeros((0,), np.float32)
    return plume_image[yy.ravel()[inside], xx.ravel()[inside]]


def auto_reject(in_plume_aod: np.ndarray) -> bool:
    """True when the modal 0.02-wide histogram bin is the zero bin
    (``plume_selector.py:210-212``)."""
    if in_plume_aod.size == 0:
        return True
    h, _ = np.histogram(in_plume_aod, bins=HIST_BINS)
    return int(np.argmax(h)) == 0


@dataclass
class PlumeReview:
    plume_id: int
    datetime: str
    crop: Optional[np.ndarray]
    hull_x: Optional[np.ndarray]
    hull_y: Optional[np.ndarray]
    in_plume_aod: Optional[np.ndarray]
    auto_rejected: bool


def review_plumes(hull_df: pd.DataFrame, granule: Granule,
                  dedup: bool = True) -> List[PlumeReview]:
    """Deduplicate and prepare every plume for review (the non-interactive
    core of ``plume_selector.main``, ``plume_selector.py:189-221``).
    ``dedup=False`` skips the duplicate pass for callers that already ran
    :func:`remove_duplicated_plumes` on the frame."""
    if dedup:
        hull_df = remove_duplicated_plumes(hull_df)
    out: List[PlumeReview] = []
    for dt in hull_df.datetime.unique():
        # strict shared resolution (io.granule.resolve_layer): a silent
        # first_layer() fallback here showed curators the WRONG orbit's
        # AOD for mispaired multi-orbit granules — the exact corruption
        # curated.granule_to_channels refuses
        aod = resolve_layer(granule, dt)
        dt_df = hull_df[hull_df.datetime == dt]
        for pid in dt_df.id.unique():
            plume_df = dt_df[dt_df.id == pid]
            crop, hx, hy = subset_plume(aod, plume_df)
            if crop is None:
                out.append(PlumeReview(int(pid), dt, None, None, None, None,
                                       True))
                continue
            vals = find_plume_aod(crop, hx, hy)
            out.append(
                PlumeReview(int(pid), dt, crop, hx, hy, vals,
                            auto_reject(vals))
            )
    return out


def apply_decisions(
    hull_df: pd.DataFrame,
    granule: Granule,
    decide: Callable[[PlumeReview], bool],
    scores: Optional[pd.DataFrame] = None,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Run review; split the (deduplicated) hull dataframe into (kept,
    rejected) by ``decide`` — auto-rejected plumes never reach ``decide``
    (reference: zero-bin plumes are skipped before display). ``scores``
    orders the ``decide`` calls most-suspect-first (interactive sessions
    under a budget see the likeliest false plumes before fatigue sets
    in); the returned split is order-independent."""
    hull_df = remove_duplicated_plumes(hull_df)
    reviews = order_reviews(review_plumes(hull_df, granule, dedup=False),
                            scores)
    kept_keys = {
        (r.plume_id, r.datetime)
        for r in reviews
        if not r.auto_rejected and decide(r)
    }
    key = list(zip(hull_df.id.astype(int), hull_df.datetime))
    mask = np.array([k in kept_keys for k in key], dtype=bool)
    return hull_df[mask], hull_df[~mask]


def order_reviews(reviews: List[PlumeReview],
                  scores: Optional[pd.DataFrame]) -> List[PlumeReview]:
    """Reviews in queue order: file order without scores (the reference's
    ordering), most-suspect-first with them (ascending model support,
    unscored plumes at the head — :mod:`plumekit.label.ranking`)."""
    if scores is None:
        return reviews
    from plumekit.label.ranking import review_order

    pos = {key: i for i, key in enumerate(review_order(scores))}
    # str() on the lookup side too: PlumeReview carries the raw hull_df
    # datetime, which a numeric CSV column parses as int64/float
    return sorted(reviews,
                  key=lambda r: pos.get((r.plume_id, str(r.datetime)),
                                        len(pos)))


def export_review_batch(
    hull_df: pd.DataFrame,
    granule: Granule,
    out_dir: str,
    scores: Optional[pd.DataFrame] = None,
) -> pd.DataFrame:
    """Write per-plume review artifacts (PNG crop + histogram) and a manifest
    CSV with a blank ``keep`` column for humans to fill; returns the
    manifest.

    With ``scores`` (a :func:`plumekit.label.ranking.plume_support` frame)
    the manifest is ordered most-suspect-first and carries the
    ``model_support`` column — curators working down the file spend their
    budget on the plumes the model disbelieves."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    support = {}
    if scores is not None:
        from plumekit.label.ranking import SUPPORT_COL

        support = {(int(r.id), str(r.datetime)): getattr(r, SUPPORT_COL)
                   for r in scores.itertuples()}
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for r in order_reviews(review_plumes(hull_df, granule), scores):
        # crop-less plumes (NaN hulls) get no PNG: the manifest column is
        # empty rather than naming a file that was never written
        png = (f"{granule.name}_{r.datetime}_{r.plume_id}.png"
               if r.crop is not None else "")
        if r.crop is not None:
            fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(10, 4))
            vmax = float(r.in_plume_aod.max()) if r.in_plume_aod.size else 1.0
            ax0.imshow(r.crop, vmin=0, vmax=max(vmax, 1e-3))
            ax0.plot(r.hull_x, r.hull_y, "r--", lw=2)
            ax1.hist(r.in_plume_aod, bins=HIST_BINS)
            fig.savefig(os.path.join(out_dir, png), bbox_inches="tight")
            plt.close(fig)
        row = {"id": r.plume_id, "datetime": r.datetime, "png": png,
               "auto_rejected": r.auto_rejected, "keep": ""}
        if scores is not None:
            row["model_support"] = support.get(
                (r.plume_id, str(r.datetime)), float("nan"))
        rows.append(row)
    manifest = pd.DataFrame(rows)
    manifest.to_csv(os.path.join(out_dir, "manifest.csv"), index=False)
    return manifest


def interactive_review(hull_df: pd.DataFrame, granule: Granule,
                       scores: Optional[pd.DataFrame] = None):
    """Reference-style blocking review: '1' keeps, '0' rejects
    (``plume_selector.py:118-134``); ``scores`` presents plumes
    most-suspect-first (:func:`apply_decisions`)."""
    import matplotlib.pyplot as plt

    def decide(r: PlumeReview) -> bool:
        decision = {}

        def press(event):
            if event.key in ("0", "1"):
                decision["keep"] = event.key == "1"
                plt.close()

        fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(12, 5))
        fig.canvas.mpl_connect("key_press_event", press)
        vmax = float(r.in_plume_aod.max()) if r.in_plume_aod.size else 1.0
        im = ax0.imshow(r.crop, vmin=0, vmax=max(vmax, 1e-3))
        plt.colorbar(ax=ax0, mappable=im)
        ax0.plot(r.hull_x, r.hull_y, "r--", lw=2)
        ax1.hist(r.in_plume_aod, bins=HIST_BINS)
        plt.show()
        return decision.get("keep", False)

    return apply_decisions(hull_df, granule, decide, scores=scores)
