"""Host-side IO: granule decode, fire tables, synthetic fixtures, prefetch.

Replaces the reference's per-script HDF4 decode (``tools.py:67-130``,
``plume_identifier_basic.py:39-85``) and fire-CSV loading
(``plume_identifier_rg.py:534-535``) with a typed :class:`Granule` container,
NPZ/HDF5 formats for fixtures, an optional pyhdf-gated MAIAC reader, and a
double-buffered host→device prefetch pipeline (BASELINE.json config 5).
"""

from plumekit.io.granule import Granule, load_granule, save_granule, read_maiac_hdf4
from plumekit.io.fires import load_fire_csv, subset_fires_to_image
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene, make_fire_dataframe
from plumekit.io.prefetch import device_prefetch

__all__ = [
    "Granule",
    "load_granule",
    "save_granule",
    "read_maiac_hdf4",
    "load_fire_csv",
    "subset_fires_to_image",
    "SyntheticSceneConfig",
    "make_scene",
    "make_fire_dataframe",
    "device_prefetch",
]
