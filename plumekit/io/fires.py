"""VIIRS active-fire tables.

The reference loads ``viirs_americas_201707_201709.csv`` with columns
``latitude, longitude, frp, acq_date`` and derives ``date_time``
(``plume_identifier_rg.py:534-535``); per-scene subsetting filters by date,
image bbox and FRP (``plume_identifier_rg.py:50-58``). The reference filters
the date-subset frame with a *full-frame* boolean mask (chained-indexing
quirk, SURVEY.md bug #8) — index alignment makes that equivalent to the clean
formulation used here.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd


def load_fire_csv(path: str) -> pd.DataFrame:
    """Load a VIIRS fire CSV and add the ``date_time`` column
    (``plume_identifier_rg.py:534-535`` semantics)."""
    df = pd.read_csv(path)
    df["date_time"] = pd.to_datetime(df["acq_date"])
    return df


def subset_fires_to_image(
    lat: np.ndarray,
    lon: np.ndarray,
    fire_df: pd.DataFrame,
    date_to_find,
    min_frp: Optional[float] = None,
) -> pd.DataFrame:
    """Fires on ``date_to_find`` inside the image bbox, optionally with
    ``frp > min_frp`` (``plume_identifier_rg.py:50-58``; the gaussian variant
    omits the FRP gate, ``plume_identifier_gaussian_profile.py:48-55``)."""
    sub = fire_df[fire_df.date_time == date_to_find]
    # nan-aware bbox: polar/off-lens grid corners carry NaN coordinates
    # (geo/sinusoidal.py invalid guard) and a plain np.min would turn the
    # whole bbox NaN, silently dropping every fire
    sub = sub[
        (sub.latitude > float(np.nanmin(lat)))
        & (sub.latitude < float(np.nanmax(lat)))
        & (sub.longitude > float(np.nanmin(lon)))
        & (sub.longitude < float(np.nanmax(lon)))
    ]
    if min_frp is not None:
        sub = sub.loc[sub.frp > min_frp]
    return sub
