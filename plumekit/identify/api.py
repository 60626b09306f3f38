"""Unified identification API.

The reference ships four near-duplicate modules with triplicated helpers
(SURVEY.md §7: subset/haversine/locate/grid_indexes copied across
``plume_identifier_{basic,rg,gaussian_profile}.py``). plumekit exposes one
``identify(granule, fires, cfg)`` whose behavior is selected by the config
dataclass type, returning a typed :class:`PlumeSet`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Union

import numpy as np
import pandas as pd

from plumekit.config.identify import (
    BasicIdentifyConfig,
    GaussianIdentifyConfig,
    RGIdentifyConfig,
)
from plumekit.io.granule import Granule
from plumekit.identify import basic as _basic
from plumekit.identify import gaussian as _gaussian
from plumekit.identify import rg as _rg

IdentifyConfig = Union[BasicIdentifyConfig, RGIdentifyConfig,
                       GaussianIdentifyConfig]


@dataclass
class PlumeSet:
    """Per-scene identification result.

    ``aod_stats``/``hulls`` carry the reference's CSV schemas
    (``plume_identifier_rg.py:425-457``) so the selector and downstream
    tooling are drop-in; ``masks`` (plume id → HxW bool) and
    ``labelled_image`` add what the reference only kept implicitly.
    """

    aod_stats: pd.DataFrame
    hulls: pd.DataFrame
    masks: Dict[int, np.ndarray] = field(default_factory=dict)
    labelled_image: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return int(self.aod_stats["id"].nunique()) if len(self.aod_stats) else (
            int(self.hulls["id"].nunique()) if len(self.hulls) else 0
        )


def identify(
    granule: Granule,
    fire_df: pd.DataFrame,
    date_to_find,
    cfg: IdentifyConfig = RGIdentifyConfig(),
) -> PlumeSet:
    """Run the detector selected by ``cfg`` on a granule.

    * :class:`RGIdentifyConfig` → threshold-sweep detector on the first
      layer (the rg main reads a single layer, ``plume_identifier_rg.py:572``);
    * :class:`GaussianIdentifyConfig` → multi-scale detector over *all*
      orbit layers (``..._gaussian_profile.py:608``);
    * :class:`BasicIdentifyConfig` → fixed-threshold detector on the first
      layer (``..._basic.py:369``; negatives are zeroed there, not −999).
    """
    if isinstance(cfg, RGIdentifyConfig):
        aod = granule.first_layer()
        aod_df, hull_df, out = _rg.identify(
            aod, granule.lat, granule.lon, date_to_find, fire_df, cfg
        )
        # plume-ID-keyed masks from identify()'s single hull walk — keys
        # match aod_df/hull_df ids exactly (a zip over accepted FIRE slots
        # here would drift whenever a degenerate-hull plume is dropped)
        return PlumeSet(aod_stats=aod_df, hulls=hull_df,
                        masks=_rg.plume_masks(out))

    if isinstance(cfg, GaussianIdentifyConfig):
        hull_df = _gaussian.identify_granule(granule, fire_df, date_to_find, cfg)
        return PlumeSet(
            aod_stats=pd.DataFrame(), hulls=hull_df
        )

    if isinstance(cfg, BasicIdentifyConfig):
        aod = granule.first_layer().copy()
        aod[aod < 0] = 0.0  # basic variant zeroes fills (..._basic.py:44)
        plume_dict, plume_image = _basic.identify(
            aod, granule.lat, granule.lon, date_to_find, fire_df, cfg
        )
        rows = [
            {"id": pid, "plume_min_row": bb["min_r"], "plume_max_row": bb["max_r"],
             "plume_min_col": bb["min_c"], "plume_max_col": bb["max_c"]}
            for pid, bb in plume_dict.items()
        ]
        bbox_cols = ["id", "plume_min_row", "plume_max_row",
                     "plume_min_col", "plume_max_col"]
        return PlumeSet(
            # explicit columns: an empty rows list must still write a
            # CSV with a header (a column-less frame round-trips as
            # EmptyDataError downstream)
            aod_stats=pd.DataFrame(rows, columns=bbox_cols),
            hulls=pd.DataFrame(),
            labelled_image=plume_image,
        )

    raise TypeError(f"unknown identify config type: {type(cfg)!r}")
