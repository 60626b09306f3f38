"""Model-guided curation ordering ("active curation").

A U-Net trained on the weak labels disagrees most with the plumes that
were mislabeled: a detection whose pixels receive low mean predicted
probability is one the model could not reconcile with the rest of the
training signal — the likeliest false positive, and therefore the best
use of the next human decision (the confident-learning signal,
arXiv:1911.00068 §2, applied per-plume instead of per-pixel). Ranking
the review queue by ascending model support front-loads curation's
value: in the measured false-plume regime the planted distractor plumes
concentrate at the head of the queue (AUROC + budget curves in
``experiments/active_curation.py``, results in BASELINE.md).

The reference reviews plumes in file order (``plume_selector.py:189-221``)
— with hundreds of detections per campaign the ordering IS the budget.
plumekit keeps that default and adds the ranked queue as an opt-in:
``plumekit select --rank-with-predictions`` joins each granule's saved
probability map (``predict_model`` NPZs) against its per-plume device
masks (``build_features`` NPZs, falling back to hull rasterisation) and
orders the review manifest most-suspect-first with the score attached.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

import numpy as np
import pandas as pd

from plumekit.utils import get_logger

logger = get_logger(__name__)

#: manifest/score column name
SUPPORT_COL = "model_support"


def plume_support(
    probs: np.ndarray,
    hull_df: pd.DataFrame,
    masks: Optional[Mapping[str, np.ndarray]] = None,
) -> pd.DataFrame:
    """Per-plume mean predicted probability ("model support").

    ``probs`` is the granule's (H, W) plume-probability map (a
    ``predict_model`` NPZ). Each (``datetime``, ``id``) group in
    ``hull_df`` is scored over its pixel support: the per-plume device
    mask when ``masks`` carries the id (the ``build_features``
    ``*_masks.npz`` mapping, keys = ``str(id)``), else the rasterised
    convex hull — the same artifact order the curated-training path
    prefers (:mod:`plumekit.train.curated`). Returns a dataframe with
    one row per plume: ``id``, ``datetime``, ``model_support``,
    ``n_pixels``. Degenerate plumes (empty mask AND degenerate hull)
    get support NaN — they sort to the review front alongside the
    lowest-support plumes, which is where a plume the model never saw
    belongs.
    """
    from plumekit.train.curated import rasterize_hulls

    rows = []
    for (dt, pid), g in hull_df.groupby(["datetime", "id"], sort=True):
        mask = None
        if masks is not None:
            m = masks.get(str(int(pid)))
            if m is not None and m.shape == probs.shape:
                mask = np.asarray(m, dtype=bool)
            elif m is not None:
                logger.warning(
                    "plume %s: device mask shape %s != prediction %s "
                    "(stale artifact?) — scoring the hull instead",
                    pid, m.shape, probs.shape)
        if mask is None:
            mask = rasterize_hulls(g, probs.shape)
        n = int(mask.sum())
        support = float(probs[mask].mean()) if n else float("nan")
        # datetime normalised to str: every downstream key join
        # (review_order, the selector's support lookup, the decisions CSV)
        # uses string keys, and a numeric-parsed CSV column would
        # otherwise silently miss every lookup
        rows.append({"id": int(pid), "datetime": str(dt),
                     SUPPORT_COL: support, "n_pixels": n})
    return pd.DataFrame(rows,
                        columns=["id", "datetime", SUPPORT_COL, "n_pixels"])


def load_prediction(predictions_dir: str, base: str) -> Optional[np.ndarray]:
    """The saved probability map for granule ``base``, or None.

    ``predict_model`` writes ``<base>_pred.npz`` with a ``probs`` array
    (fp32, or uint8/255 under ``--quantize-output`` — decoded here so
    support scores are dtype-independent)."""
    path = os.path.join(predictions_dir, base + "_pred.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        probs = data["probs"]
        if probs.dtype == np.uint8:
            from plumekit.ops.quant import dequantize_probs_uint8

            probs = dequantize_probs_uint8(probs)
        return np.asarray(probs, dtype=np.float32)


def load_plume_masks(mask_dir: str, base: str) -> Optional[dict]:
    """The ``build_features`` per-plume mask mapping for ``base`` (keys =
    ``str(id)``), or None when the campaign ran without ``--no-masks``
    artifacts."""
    path = os.path.join(mask_dir, base + "_masks.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        return {k: data[k].copy() for k in data.files}


def review_order(scores: pd.DataFrame) -> list:
    """Review queue as (id, datetime) keys, most-suspect first: ascending
    model support with NaN (never-scored plumes) at the very front."""
    s = scores.copy()
    # NaN support sorts first: a plume the model never saw is maximally
    # unvetted and belongs at the head of the queue
    s["_key"] = s[SUPPORT_COL].fillna(-np.inf)
    s = s.sort_values(["_key", "datetime", "id"], kind="stable")
    return [(int(r.id), str(r.datetime)) for r in s.itertuples()]
