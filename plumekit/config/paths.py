"""Dataset/workspace paths.

Replaces the reference's hard-coded absolute roots (``src/config/filepaths.py:7-33``
and the per-main path blocks, e.g. ``plume_identifier_rg.py:522-529``) with a
single relocatable dataclass. Directory names keep the reference layout so a
user of the reference finds the same structure.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class PathsConfig:
    """Workspace layout rooted at ``root`` (reference ``filepaths.py:7``)."""

    #: read at CONSTRUCTION time (a class-body default would
    #: freeze the env var as of first import)
    root: str = field(default_factory=lambda: os.environ.get(
        "PLUMEKIT_ROOT", "data"))

    # plume identification tree (reference plume_identifier_rg.py:525-529)
    maiac_dir: str = "raw/plume_identification/maiac"
    log_dir: str = "raw/plume_identification/logs"
    aod_df_dir: str = "raw/plume_identification/dataframes/full/aod"
    hull_df_dir: str = "raw/plume_identification/dataframes/full/hull"
    plot_dir: str = "raw/plume_identification/plots"

    # curated (selector) outputs (reference plume_selector.py:148-155)
    reduced_plume_hull_dir: str = "raw/plume_identification/dataframes/reduced/plume/hull"
    reduced_not_plume_hull_dir: str = "raw/plume_identification/dataframes/reduced/not_plume/hull"

    # VIIRS SDR + reprojections (reference filepaths.py:13-19)
    viirs_sdr_dir: str = "raw/viirs/sdr"
    viirs_sdr_reproj_tcc_dir: str = "raw/reprojected_viirs/tcc"
    viirs_sdr_reproj_blue_dir: str = "raw/reprojected_viirs/blue"
    viirs_sdr_reproj_h5_dir: str = "raw/reprojected_viirs/h5"
    viirs_aod_dir: str = "raw/viirs/aod"
    viirs_geo_dir: str = "raw/viirs/geo"
    viirs_masks_dir: str = "raw/viirs/masks"

    # VIIRS ML data tree (reference filepaths.py:22-26)
    ml_viirs_sdr_dir: str = "raw/ml_data_viirs/sdr"
    ml_viirs_tcc_dir: str = "raw/ml_data_viirs/tcc"
    ml_viirs_h5_dir: str = "raw/ml_data_viirs/h5"
    ml_viirs_plume_masks_dir: str = "raw/ml_data_viirs/mask_full_plume"

    # fires (reference filepaths.py:29, plume_identifier_rg.py:533)
    fires_dir: str = "raw/fires"

    # ML data + model dirs (reference filepaths.py:32-33)
    model_data_dir: str = "processed/model_data"
    model_dir: str = "models"

    # prediction/evaluation outputs (plumekit extensions; single source of
    # truth shared by predict_model / evaluate_model / report — duplicated
    # literals drifted once already)
    predictions_dir: str = "processed/predictions"
    evaluation_csv: str = "processed/evaluation.csv"

    #: per-plume device masks saved by build_features (plumekit extension:
    #: the reference persists only hulls — plume_selector.py:229-233 — so
    #: its curated training targets are convex fills; keeping the detector
    #: masks lets prepare_model_data build sharper curated targets)
    plume_mask_dir: str = "interim/plume_masks"

    def resolve(self, name: str, create: bool = False) -> str:
        """Absolute path of the named sub-directory. A read-only query by
        default; pass ``create=True`` (or use :meth:`ensure`) on write paths —
        querying a path must not mkdir as a side effect."""
        p = os.path.join(self.root, getattr(self, name))
        if create:
            os.makedirs(p, exist_ok=True)
        return p

    def ensure(self, name: str) -> str:
        """Absolute path of the named sub-directory, created if missing."""
        return self.resolve(name, create=True)
