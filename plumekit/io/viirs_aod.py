"""VIIRS IP aerosol product ingestion — the reference notebook's workflow.

The one committed reference workflow not covered elsewhere lives in
``notebooks/Identifying plumes from AOD and Active Fires.ipynb``: read a
VIIRS IVAOT granule (``All_Data/VIIRS-Aeros-Opt-Thick-IP_All/faot550``,
cell 6) with its terrain-corrected GMTCO geolocation companion
(``All_Data/VIIRS-MOD-GEO-TC_All/Latitude|Longitude``, cell 6), resample to
a 750 m modal-UTM grid with invalid AOD excluded from the source set
(cell 10), subset FIRMS fires to the scene date/bbox at FRP > 10
(cells 5, 13), and run the fixed-threshold ("basic") detector on the
resampled raster (cells 14-25 restate ``plume_identifier_basic.py``'s
screen → mask → label → nearest-label chain). ``filepaths.py:21-22``
reserves ``path_to_viirs_aod``/``path_to_viirs_geo`` for exactly these
products; this module is their consumer.

TPU shape: the h5 decode stays host-side; the resample is the
:class:`~plumekit.geo.utm.UTMResampler` gather plan (device-applicable);
the detection is the existing one-program-per-scene device pipeline.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from plumekit.geo.utm import UTMResampler
from plumekit.utils import get_logger

logger = get_logger(__name__)

#: HDF5 group/dataset layout demonstrated by notebook cell 6
IVAOT_DATASET = "All_Data/VIIRS-Aeros-Opt-Thick-IP_All/faot550"
GMTCO_LAT = "All_Data/VIIRS-MOD-GEO-TC_All/Latitude"
GMTCO_LON = "All_Data/VIIRS-MOD-GEO-TC_All/Longitude"

# IDPS granule filename, e.g. (notebook cell 4)
# IVAOT_npp_d20160822_t1702001_e1703242_b24974_c20181017161815133750_noaa_ops.h5
_STAMP_RE = re.compile(
    r"^(?P<product>[A-Z0-9]+)_(?P<platform>[a-z0-9]+)"
    r"_d(?P<date>\d{8})_t(?P<start>\d{7})_e(?P<end>\d{7})"
    r"_b(?P<orbit>\d+)_c(?P<created>\d+)_(?P<origin>\w+)\.h5$"
)


@dataclass(frozen=True)
class GranuleStamp:
    """Identity fields of an IDPS VIIRS granule filename."""

    product: str
    platform: str
    date: _dt.date
    start: str
    end: str
    orbit: int

    @property
    def key(self) -> Tuple[str, str, str, str, int]:
        """Pairing key: two products of one granule share everything but
        the product code and creation stamp (notebook cell 4's IVAOT/GMTCO
        pair differs only there)."""
        return (self.platform, self.date.isoformat(), self.start, self.end,
                self.orbit)


def parse_granule_filename(fname: str) -> Optional[GranuleStamp]:
    m = _STAMP_RE.match(os.path.basename(fname))
    if not m:
        return None
    d = m.group("date")
    return GranuleStamp(
        product=m.group("product"),
        platform=m.group("platform"),
        date=_dt.date(int(d[:4]), int(d[4:6]), int(d[6:8])),
        start=m.group("start"),
        end=m.group("end"),
        orbit=int(m.group("orbit")),
    )


def format_granule_filename(stamp: GranuleStamp,
                            created: str = "0" * 20,
                            origin: str = "noaa_ops") -> str:
    return (f"{stamp.product}_{stamp.platform}"
            f"_d{stamp.date:%Y%m%d}_t{stamp.start}_e{stamp.end}"
            f"_b{stamp.orbit:05d}_c{created}_{origin}.h5")


def read_ivaot_aod(path: str) -> np.ndarray:
    """faot550 layer as float32; fills stay negative (the product encodes
    every fill/bad-retrieval class below zero — the notebook treats
    ``aod < 0`` as invalid, cell 10)."""
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f[IVAOT_DATASET][:], dtype=np.float32)


def read_gmtco_geo(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """(lat, lon) float64 swath grids from the terrain-corrected geo file."""
    import h5py

    with h5py.File(path, "r") as f:
        lat = np.asarray(f[GMTCO_LAT][:], dtype=np.float64)
        lon = np.asarray(f[GMTCO_LON][:], dtype=np.float64)
    return lat, lon


def pair_granules(aod_dir: str, geo_dir: str) -> List[Dict[str, str]]:
    """Match IVAOT files to their GMTCO companions by granule identity.

    Returns ``[{"aod": path, "geo": path, "stamp": GranuleStamp}, ...]``
    sorted by (date, start). Unpaired files are logged and skipped."""
    geos: Dict[tuple, str] = {}
    for fname in sorted(os.listdir(geo_dir)):
        st = parse_granule_filename(fname)
        if st is not None and st.product == "GMTCO":
            geos[st.key] = os.path.join(geo_dir, fname)

    pairs: List[Dict[str, str]] = []
    for fname in sorted(os.listdir(aod_dir)):
        st = parse_granule_filename(fname)
        if st is None or st.product != "IVAOT":
            continue
        geo = geos.get(st.key)
        if geo is None:
            logger.warning("no GMTCO companion for %s; skipping", fname)
            continue
        pairs.append({"aod": os.path.join(aod_dir, fname), "geo": geo,
                      "stamp": st})
    pairs.sort(key=lambda p: (p["stamp"].date, p["stamp"].start))
    return pairs


def resample_viirs_aod(
    aod: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    pixel_size_m: float = 750.0,
    radius_of_influence_m: float = 10000.0,
):
    """Notebook cells 9-10: UTM grid over the full swath; invalid AOD
    (``aod < 0``) and off-earth geolocation fills excluded from the
    nearest-neighbour source set; off-grid cells become NaN.

    Returns ``(resampler, aod_r (y, x) float32 with NaN nulls,
    lat_grid, lon_grid)``."""
    valid = (aod >= 0) & (np.abs(lat) <= 90) & (np.abs(lon) <= 180)
    resampler = UTMResampler(
        lat, lon, pixel_size_m,
        radius_of_influence=radius_of_influence_m,
        source_valid=valid,
    )
    aod_r = np.asarray(resampler.resample_image(aod, fill_value=np.nan),
                       dtype=np.float32)
    lon_grid, lat_grid = resampler.lonlats()
    return resampler, aod_r, lat_grid, lon_grid


def identify_viirs_aod(
    aod_path: str,
    geo_path: str,
    fire_df,
    cfg=None,
    pixel_size_m: float = 750.0,
):
    """The notebook end-to-end (cells 4-25): IVAOT/GMTCO pair → UTM
    resample → fixed-threshold plume identification against the scene
    date's fires.

    Returns ``(plume_dict, plume_image, aod_r, resampler)`` where the first
    two follow :func:`plumekit.identify.basic.identify`. The detector runs
    on the NaN-null raster: NaN windows fail the background-ratio screen
    (the notebook's NaN fill has the same effect in cell 23) and NaN
    pixels never pass the 0.2 mask."""
    from plumekit.config.identify import BasicIdentifyConfig
    from plumekit.identify import basic

    stamp = parse_granule_filename(aod_path)
    if stamp is None:
        raise ValueError(f"not an IDPS granule filename: {aod_path}")
    aod = read_ivaot_aod(aod_path)
    lat, lon = read_gmtco_geo(geo_path)
    if aod.shape != lat.shape:
        raise ValueError(
            f"AOD swath {aod.shape} does not match geolocation {lat.shape}; "
            "mispaired granules?")
    resampler, aod_r, lat_grid, lon_grid = resample_viirs_aod(
        aod, lat, lon, pixel_size_m)

    import pandas as pd

    date_to_find = pd.Timestamp(stamp.date)
    cfg = cfg or BasicIdentifyConfig()
    plume_dict, plume_image = basic.identify(
        np.nan_to_num(aod_r, nan=-999.0), lat_grid, lon_grid,
        date_to_find, fire_df, cfg)
    return plume_dict, plume_image, aod_r, resampler


def make_synthetic_ivaot_scene(
    lines: int = 96,
    samples: int = 128,
    date: _dt.date = _dt.date(2016, 8, 22),
    seed: int = 0,
    n_plumes: int = 1,
    fill_fraction: float = 0.06,
):
    """A notebook-shaped synthetic scene: scan-geometry swath (bowtie
    cross-track growth), plume(s) rooted at fire clusters, negative-fill
    retrieval gaps, and a FIRMS-style fire table for the granule date.

    Returns ``(stamp, aod (lines, samples) float32, lat, lon, fire_df,
    plume_origins_swath_rc)``."""
    from plumekit.io.synthetic import (_anisotropic_gaussian,
                                       make_fire_dataframe)
    from plumekit.io.viirs import make_synthetic_swath

    rng = np.random.default_rng(seed)
    sw = make_synthetic_swath(lines=lines, samples=samples, seed=seed)
    lat, lon = sw.lat, sw.lon

    aod = (0.05 + 0.02 * rng.standard_normal((lines, samples))
           ).astype(np.float32)
    aod = np.clip(aod, 0.0, None)
    origins = []
    fire_rows, fire_cols, frps = [], [], []
    for k in range(n_plumes):
        r0 = rng.uniform(0.3, 0.7) * lines
        c0 = rng.uniform(0.25, 0.6) * samples
        theta = rng.uniform(0, np.pi)
        s_major, s_minor = 12.0, 3.0
        rc = r0 + s_major * np.sin(theta)
        cc = c0 + s_major * np.cos(theta)
        aod += 0.7 * _anisotropic_gaussian(
            (lines, samples), rc, cc, theta, s_major, s_minor
        ).astype(np.float32)
        origins.append((int(r0), int(c0)))
        for _ in range(4):
            fire_rows.append(int(np.clip(r0 + rng.normal(0, 1.2), 0,
                                         lines - 1)))
            fire_cols.append(int(np.clip(c0 + rng.normal(0, 1.2), 0,
                                         samples - 1)))
            frps.append(float(rng.uniform(30.0, 200.0)))

    # retrieval-failure stripe: the IVAOT product encodes fills below zero
    n_fill = int(fill_fraction * lines)
    if n_fill:
        aod[:n_fill] = -999.3

    fire_df = make_fire_dataframe(lat, lon, fire_rows, fire_cols, frps,
                                  date.isoformat(), rng)
    stamp = GranuleStamp(product="IVAOT", platform="npp", date=date,
                         start="1702001", end="1703242", orbit=24974 + seed)
    return stamp, aod, lat, lon, fire_df, origins


def write_synthetic_pair(
    aod_dir: str,
    geo_dir: str,
    stamp: GranuleStamp,
    aod: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
) -> Tuple[str, str]:
    """Write an IVAOT/GMTCO fixture pair in the notebook's exact h5 layout
    (same stub discipline as the HDF4 tests — no real granules exist in
    this environment)."""
    import h5py

    from dataclasses import replace

    aod_name = format_granule_filename(replace(stamp, product="IVAOT"))
    geo_name = format_granule_filename(replace(stamp, product="GMTCO"))
    aod_path = os.path.join(aod_dir, aod_name)
    geo_path = os.path.join(geo_dir, geo_name)
    with h5py.File(aod_path, "w") as f:
        f.create_dataset(IVAOT_DATASET, data=np.asarray(aod, np.float32))
    with h5py.File(geo_path, "w") as f:
        f.create_dataset(GMTCO_LAT, data=np.asarray(lat, np.float32))
        f.create_dataset(GMTCO_LON, data=np.asarray(lon, np.float32))
    return aod_path, geo_path
