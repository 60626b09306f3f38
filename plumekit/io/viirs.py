"""VIIRS SDR swath IO + the swath→UTM reprojection workflow.

The reference reserves a full VIIRS path family — SDR granules, tcc/blue/h5
reprojections, AOD/geo/masks and an ML-data tree
(``src/config/filepaths.py:13-26``) — and ships the ``utm_resampler``
(``tools.py:9-64``) that serves it, but no committed code ever walks those
directories. plumekit closes that gap: this module defines the swath
container (curvilinear lat/lon + named channels), a synthetic scan-geometry
generator (no real SDRs exist in this environment), and
:func:`reproject_swath`, which drives :class:`plumekit.geo.utm.UTMResampler`
to produce the ``raw/reprojected_viirs/h5`` products the reference's layout
promises.

The resampler's gather plan applies on device (pure ``take``), so the
per-channel resample of a many-channel swath is one fused XLA program.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict

import numpy as np

from plumekit.geo.utm import UTMResampler

#: fill for off-swath grid cells, matching the AOD null convention
FILL_VALUE = -999.0


@dataclass
class Swath:
    """One VIIRS-like granule in scan geometry: curvilinear ``lat``/``lon``
    of shape (lines, samples) plus named channel rasters of the same shape."""

    lat: np.ndarray
    lon: np.ndarray
    channels: Dict[str, np.ndarray] = field(default_factory=dict)
    name: str = "swath"

    @property
    def shape(self):
        return self.lat.shape


def save_swath(path: str, swath: Swath) -> None:
    arrays = {"lat": swath.lat, "lon": swath.lon}
    for ch, img in swath.channels.items():
        arrays[f"ch_{ch}"] = img
    np.savez_compressed(path, name=swath.name, **arrays)


def load_swath(path: str) -> Swath:
    data = np.load(path, allow_pickle=False)
    channels = {
        k[len("ch_"):]: data[k] for k in data.files if k.startswith("ch_")
    }
    name = str(data["name"]) if "name" in data.files else "swath"
    return Swath(lat=data["lat"], lon=data["lon"], channels=channels,
                 name=name)


def make_synthetic_swath(
    lines: int = 96,
    samples: int = 128,
    center_lat: float = -10.0,
    center_lon: float = -60.0,
    track_azimuth_deg: float = 15.0,
    nadir_km: float = 0.75,
    edge_growth: float = 2.0,
    seed: int = 0,
    name: str = "viirs_swath",
) -> Swath:
    """A VIIRS-like swath with real scan geometry distortions.

    Cross-track sample spacing grows from ``nadir_km`` at nadir to
    ``edge_growth``× at the scan edges (the bowtie footprint growth), and the
    ground track is rotated by ``track_azimuth_deg`` — so the lat/lon grid is
    genuinely curvilinear and exercises the kd-tree gather plan, unlike a
    regular raster. Channels: ``blue`` (M3-like radiance with smooth scene
    structure), ``aod`` (plume-like field), ``red``/``green`` (for the tcc
    composite the reference's layout reserves)."""
    rng = np.random.default_rng(seed)
    j = np.arange(samples) - (samples - 1) / 2.0
    # integrated cross-track distance with quadratic spacing growth
    spacing = nadir_km * (1.0 + (edge_growth - 1.0) * (j / j[-1]) ** 2)
    cross_km = np.cumsum(spacing) - np.cumsum(spacing)[samples // 2]
    along_km = (np.arange(lines) - (lines - 1) / 2.0) * nadir_km

    az = np.radians(track_azimuth_deg)
    xk = along_km[:, None] * np.sin(az) + cross_km[None, :] * np.cos(az)
    yk = along_km[:, None] * np.cos(az) - cross_km[None, :] * np.sin(az)

    km_per_deg_lat = 111.32
    km_per_deg_lon = km_per_deg_lat * np.cos(np.radians(center_lat))
    lat = center_lat + yk / km_per_deg_lat
    lon = center_lon + xk / km_per_deg_lon

    yy, xx = np.mgrid[0:lines, 0:samples].astype(np.float64)
    blue = (
        0.3
        + 0.2 * np.sin(2 * np.pi * xx / samples) * np.cos(2 * np.pi * yy / lines)
        + 0.02 * rng.standard_normal((lines, samples))
    ).astype(np.float32)
    r0, c0 = lines * 0.4, samples * 0.5
    aod = (
        0.1
        + 0.8 * np.exp(-0.5 * (((yy - r0) / (lines * 0.08)) ** 2
                               + ((xx - c0) / (samples * 0.25)) ** 2))
    ).astype(np.float32)
    red = (0.25 + 0.15 * (xx / samples)).astype(np.float32)
    green = (0.25 + 0.15 * (yy / lines)).astype(np.float32)
    return Swath(lat=lat, lon=lon,
                 channels={"blue": blue, "aod": aod, "red": red,
                           "green": green},
                 name=name)


def reproject_swath(
    swath: Swath,
    pixel_size_m: float = 750.0,
    radius_of_influence_m: float = 10000.0,
):
    """Resample every channel of a swath onto its modal-UTM-zone grid.

    Returns ``(resampler, {channel: (y, x) float32 raster})`` with off-swath
    cells at :data:`FILL_VALUE`. One gather plan (host kd-tree, built once)
    serves all channels; the applies are device-friendly gathers."""
    resampler = UTMResampler(swath.lat, swath.lon, pixel_size_m,
                             radius_of_influence=radius_of_influence_m)
    out = {
        ch: np.asarray(resampler.resample_image(img, fill_value=FILL_VALUE),
                       dtype=np.float32)
        for ch, img in swath.channels.items()
    }
    return resampler, out


def write_reprojected_h5(path: str, resampler: UTMResampler,
                         rasters: Dict[str, np.ndarray]) -> None:
    """The ``raw/reprojected_viirs/h5`` product: per-channel UTM rasters plus
    the grid metadata needed to go back to geo coordinates."""
    import h5py

    with h5py.File(path, "w") as f:
        for ch, img in rasters.items():
            f.create_dataset(ch, data=img)
        f.create_dataset("valid", data=resampler.valid)
        f.attrs["utm_zone"] = resampler.zone
        f.attrs["south"] = resampler.south
        f.attrs["pixel_size_m"] = resampler.pixel_size
        f.attrs["extent"] = np.asarray(resampler.extent, dtype=np.float64)
        f.attrs["fill_value"] = FILL_VALUE


def write_quicklooks(base: str, rasters: Dict[str, np.ndarray],
                     blue_dir: str, tcc_dir: str) -> None:
    """The blue-channel and true-colour-composite PNGs the reference's
    ``reprojected_viirs/{blue,tcc}`` directories reserve."""
    from plumekit.viz.plots import _plt

    plt = _plt()

    def norm(a):
        v = np.where(a == FILL_VALUE, np.nan, a)
        if not np.isfinite(v).any():      # fully off-grid channel
            return np.zeros_like(a, dtype=np.float32)
        lo, hi = np.nanmin(v), np.nanmax(v)
        return np.nan_to_num((v - lo) / max(hi - lo, 1e-9))

    if "blue" in rasters:
        plt.imsave(os.path.join(blue_dir, base + "_blue.png"),
                   norm(rasters["blue"]), cmap="gray")
    if all(ch in rasters for ch in ("red", "green", "blue")):
        rgb = np.stack([norm(rasters[c]) for c in ("red", "green", "blue")],
                       axis=-1)
        plt.imsave(os.path.join(tcc_dir, base + "_tcc.png"), rgb)
