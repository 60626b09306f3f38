"""Dataset/workspace paths.

Replaces the reference's hard-coded absolute roots (``src/config/filepaths.py:7-33``
and the per-main path blocks, e.g. ``plume_identifier_rg.py:522-529``) with a
single relocatable dataclass. Directory names keep the reference layout so a
user of the reference finds the same structure.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class PathsConfig:
    """Workspace layout rooted at ``root`` (reference ``filepaths.py:7``)."""

    root: str = os.environ.get("PLUMEKIT_ROOT", "data")

    # plume identification tree (reference plume_identifier_rg.py:525-529)
    maiac_dir: str = "raw/plume_identification/maiac"
    log_dir: str = "raw/plume_identification/logs"
    aod_df_dir: str = "raw/plume_identification/dataframes/full/aod"
    hull_df_dir: str = "raw/plume_identification/dataframes/full/hull"
    plot_dir: str = "raw/plume_identification/plots"

    # curated (selector) outputs (reference plume_selector.py:148-155)
    reduced_plume_hull_dir: str = "raw/plume_identification/dataframes/reduced/plume/hull"
    reduced_not_plume_hull_dir: str = "raw/plume_identification/dataframes/reduced/not_plume/hull"

    # fires (reference filepaths.py:29, plume_identifier_rg.py:533)
    fires_dir: str = "raw/fires"

    # ML data + model dirs (reference filepaths.py:32-33)
    model_data_dir: str = "processed/model_data"
    model_dir: str = "models"

    def resolve(self, name: str) -> str:
        """Absolute path of the named sub-directory, created on demand."""
        p = os.path.join(self.root, getattr(self, name))
        os.makedirs(p, exist_ok=True)
        return p
