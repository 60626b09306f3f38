"""Granule container and decode paths.

A *granule* is one MAIAC-like scene: one or more orbit layers of AOD on a
fixed lat/lon grid. The reference returns ``({timestamp: aod}, lat, lon)``
from ``tools.read_modis_aod`` (``tools.py:67-130``); :class:`Granule` is the
typed equivalent. Storage formats:

* ``.npz`` / ``.h5`` — plumekit's native fixture formats (no HDF4 stack
  needed; SURVEY.md §7 hard part #5);
* MAIAC ``.hdf`` (HDF4) — optional, behind a pyhdf import gate, reproducing
  the reference's layer selection and scaling semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np

from plumekit.geo.sinusoidal import grid_from_extent, parse_struct_metadata

#: fill value for invalid AOD (reference ``tools.py:90``,
#: ``plume_identifier_gaussian_profile.py:41``)
NULL_VALUE = -999.0

#: MAIAC AOD scale factor (reference ``tools.py:89``)
AOD_SCALE = 0.001


@dataclass
class Granule:
    """One scene: ``layers`` maps orbit timestamp → (H, W) float32 AOD with
    invalid pixels set to :data:`NULL_VALUE`; ``lat``/``lon`` are (H, W)."""

    layers: Dict[str, np.ndarray]
    lat: np.ndarray
    lon: np.ndarray
    name: str = "granule"

    @property
    def shape(self):
        first = next(iter(self.layers.values()))
        return first.shape

    def first_layer(self) -> np.ndarray:
        return next(iter(self.layers.values()))

    def null_mask(self, ts: str) -> np.ndarray:
        return self.layers[ts] == NULL_VALUE


#: hull-CSV timestamp sentinel for detectors that run on the first layer
#: (rg/basic read a single layer — the reference rg main at
#: ``plume_identifier_rg.py:572`` — so their hull rows carry no real orbit
#: timestamp; the select CLI stamps this instead)
LAYER0_SENTINEL = "layer0"


def resolve_layer(granule: Granule, ts) -> np.ndarray:
    """The AOD layer a hull-CSV ``datetime`` names — the ONE strict
    resolution shared by curation review and curated-training assembly.

    ``layer0`` (the sentinel) and single-layer granules resolve to
    :meth:`Granule.first_layer`; an unknown timestamp on a multi-orbit
    granule raises — silently falling back would pair plume masks or
    curator decisions with the WRONG orbit's AOD, corrupting downstream
    data with no error."""
    ts = str(ts)
    if ts == LAYER0_SENTINEL:
        return granule.first_layer()
    if ts in granule.layers:
        return granule.layers[ts]
    if len(granule.layers) == 1:
        return granule.first_layer()
    raise ValueError(
        f"hull timestamp {ts!r} not among granule layers "
        f"{sorted(granule.layers)}; cannot pick an orbit layer")


def save_granule(path: str, granule: Granule) -> None:
    """NPZ (``.npz``) or HDF5 (``.h5``/``.hdf5``) serialisation."""
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset("lat", data=granule.lat)
            f.create_dataset("lon", data=granule.lon)
            g = f.create_group("layers")
            for ts, aod in granule.layers.items():
                g.create_dataset(ts, data=aod)
            f.attrs["name"] = granule.name
        return
    arrays = {"lat": granule.lat, "lon": granule.lon}
    for ts, aod in granule.layers.items():
        arrays[f"aod_{ts}"] = aod
    np.savez_compressed(path, name=granule.name, **arrays)


def load_granule(path: str) -> Granule:
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "r") as f:
            layers = {ts: np.asarray(f["layers"][ts]) for ts in f["layers"]}
            return Granule(
                layers=layers,
                lat=np.asarray(f["lat"]),
                lon=np.asarray(f["lon"]),
                name=str(f.attrs.get("name", "granule")),
            )
    if path.endswith(".hdf"):
        return read_maiac_hdf4(path)
    data = np.load(path, allow_pickle=False)
    layers = {
        k[len("aod_"):]: data[k] for k in data.files if k.startswith("aod_")
    }
    name = str(data["name"]) if "name" in data.files else "granule"
    return Granule(layers=layers, lat=data["lat"], lon=data["lon"], name=name)


#: every granule serialisation load_granule understands, in probe order
GRANULE_EXTENSIONS = (".npz", ".h5", ".hdf5", ".hdf")


def find_granule(directory: str, base: str):
    """Path of the granule named ``base`` under ``directory`` in any
    supported serialisation, or None. The single probe list shared by
    select / prepare_model_data / predict so the sites cannot drift from
    what save_granule/load_granule actually support."""
    import os

    for ext in GRANULE_EXTENSIONS:
        cand = os.path.join(directory, base + ext)
        if os.path.exists(cand):
            return cand
    return None


def read_maiac_hdf4(path: str, max_layers_rule: bool = True,
                    correct_orbit_layer: bool = False) -> Granule:
    """Read a real MAIAC MCD19A2 HDF4 granule (requires ``pyhdf``).

    Reproduces ``tools.read_modis_aod`` (``tools.py:67-130``): orbit timestamps
    from the ``Orbit_time_stamp`` attribute; if more than four, keep only the
    first "A"(qua) orbit (``tools.py:79-81``); ``Optical_Depth_055`` × 0.001
    with negatives set to −999 (``tools.py:89-90``); lat/lon grid from
    ``StructMetadata.0`` corners via the native sinusoidal inverse.

    COMPAT: when the >4-orbit rule fires, the reference enumerates the
    *filtered* list, so it stores **layer 0** (possibly a Terra orbit)
    under the Aqua timestamp (``tools.py:84-90``) — the default reproduces
    that so outputs match bit-for-bit on real granules.
    ``correct_orbit_layer=True`` reads the Aqua orbit's true layer index
    instead (the intended behavior; same compat-flag pattern as
    ``CompatFlags.pick_larger_mask``).
    """
    import re

    try:
        from pyhdf.SD import SD, SDC
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "reading MAIAC .hdf requires pyhdf; use .npz/.h5 granules instead"
        ) from e

    hdf = SD(path, SDC.READ)
    fattrs = hdf.attributes(full=1)
    timestamps = [t for t in fattrs["Orbit_time_stamp"][0].split(" ") if t]
    indexed = list(enumerate(timestamps))
    if max_layers_rule and len(timestamps) > 4:
        indexed = [(i, t) for i, t in indexed if "A" in t][:1]
        if not correct_orbit_layer:
            # reference quirk: enumerate over the FILTERED list reads
            # layer 0 regardless of which orbit the timestamp names
            indexed = [(0, t) for _i, t in indexed]

    layers: Dict[str, np.ndarray] = {}
    for i, timestamp in indexed:
        m = re.search(r"[0-9]{11}[A-Z]", timestamp)
        if m is None:
            # a malformed stamp used to die two lines later with a bare
            # AttributeError on .group() — name the file and the offender
            raise ValueError(
                f"{path}: malformed orbit timestamp {timestamp!r} in "
                "Orbit_time_stamp (expected 11 digits + platform letter, "
                "e.g. '20172302054A')")
        t = m.group()
        aod = hdf.select("Optical_Depth_055")[i, :, :].astype(np.float32) * AOD_SCALE
        aod[aod < 0] = NULL_VALUE
        layers[t] = aod

    if not layers:
        # >4-orbit granule whose timestamps carry no Aqua ("A") stamp
        # (e.g. a Terra-only high-latitude tile): the reference dies with
        # an IndexError at the filter; failing here with the file and the
        # rule beats a bare StopIteration two lines later
        raise ValueError(
            f"{path}: {len(timestamps)} orbit timestamps and none is an "
            "Aqua ('A') orbit — the reference's >4-layer rule "
            "(tools.py:79-81) selects Aqua only; pass "
            "max_layers_rule=False to keep every orbit")
    gridmeta = fattrs["StructMetadata.0"][0]
    x0, y0, x1, y1 = parse_struct_metadata(gridmeta)
    ny, nx = next(iter(layers.values())).shape
    lat, lon = grid_from_extent(x0, y0, x1, y1, ny, nx)
    import os

    return Granule(layers=layers, lat=lat, lon=lon,
                   name=os.path.basename(path)[:-4])
