"""Configuration tree.

The reference scatters tunables across module-level UPPER_CASE constants
(``plume_identifier_basic.py:32-37``, ``plume_identifier_rg.py:35-44``,
``plume_identifier_gaussian_profile.py:34-44``) and hard-codes dataset roots in
``src/config/filepaths.py:7-33`` plus per-``main()`` path blocks. Here every
tunable is a dataclass field with the reference value as default.
"""

from plumekit.config.paths import PathsConfig
from plumekit.config.identify import (
    BasicIdentifyConfig,
    RGIdentifyConfig,
    GaussianIdentifyConfig,
    BlobIdentifyConfig,
    CompatFlags,
)
from plumekit.config.train import (
    UNetConfig,
    TrainConfig,
    DataConfig,
    MeshConfig,
    InferConfig,
)

__all__ = [
    "PathsConfig",
    "BasicIdentifyConfig",
    "RGIdentifyConfig",
    "GaussianIdentifyConfig",
    "BlobIdentifyConfig",
    "CompatFlags",
    "UNetConfig",
    "TrainConfig",
    "DataConfig",
    "MeshConfig",
    "InferConfig",
]
