"""UTM projection and nearest-neighbour swath resampling — native replacement
for the reference's ``utm_resampler`` (``tools.py:9-64``), which wraps
pyproj + pyresample's kd-tree.

Design split for TPU: the kd-tree *index build* stays host-side (scipy cKDTree,
built once per target grid), producing a flat gather-index map; the *apply*
step is a pure gather that runs on device and can be fused into downstream XLA
programs (SURVEY.md §2.1 "KD-tree nearest-neighbour resample").

The transverse-Mercator math uses the standard Snyder series (mm-level
accuracy for UTM's narrow zones) on the WGS84 ellipsoid.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy import stats
from scipy.spatial import cKDTree

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996
_FALSE_E = 500000.0

_M1 = 1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256
_M2 = 3 * _E2 / 8 + 3 * _E2**2 / 32 + 45 * _E2**3 / 1024
_M3 = 15 * _E2**2 / 256 + 45 * _E2**3 / 1024
_M4 = 35 * _E2**3 / 3072

_E1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
_P2 = 3 * _E1 / 2 - 27 * _E1**3 / 32
_P3 = 21 * _E1**2 / 16 - 55 * _E1**4 / 32
_P4 = 151 * _E1**3 / 96
_P5 = 1097 * _E1**4 / 512


def utm_zone_of(lons) -> int:
    """Modal UTM zone of an array of longitudes — the reference picks the zone
    most of the swath falls in (``tools.py:20-28``)."""
    lons = np.asarray(lons)
    lons = (lons + 180) - np.floor((lons + 180) / 360) * 360 - 180
    zones = np.floor((lons + 180) / 6) + 1
    mode = stats.mode(zones, axis=None)
    return int(np.atleast_1d(mode.mode)[0])


def _meridional_arc(lat):
    return _A * (
        _M1 * lat
        - _M2 * np.sin(2 * lat)
        + _M3 * np.sin(4 * lat)
        - _M4 * np.sin(6 * lat)
    )


@dataclass(frozen=True)
class UTMProjection:
    """Forward/inverse UTM for one zone (northern false northing 0, southern
    10 000 000 m, matching ``proj=utm ellps=WGS84``)."""

    zone: int
    south: bool = False

    @property
    def central_meridian_deg(self) -> float:
        return -183.0 + 6.0 * self.zone

    @property
    def false_northing(self) -> float:
        return 10000000.0 if self.south else 0.0

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees → (easting, northing) meters."""
        lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
        lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
        lon0 = np.radians(self.central_meridian_deg)

        sin_lat, cos_lat, tan_lat = np.sin(lat), np.cos(lat), np.tan(lat)
        n = _A / np.sqrt(1 - _E2 * sin_lat**2)
        t = tan_lat**2
        c = _EP2 * cos_lat**2
        # wrap Δlon into (−π, π]: an antimeridian swath projected in zone
        # 1/60 otherwise feeds ±357° differences into the series and blows
        # the grid extent to planetary scale (round-4 antimeridian fuzz;
        # pyproj wraps identically)
        dlon = lon - lon0
        dlon = dlon - 2 * np.pi * np.round(dlon / (2 * np.pi))
        a = dlon * cos_lat
        m = _meridional_arc(lat)

        east = _FALSE_E + _K0 * n * (
            a
            + (1 - t + c) * a**3 / 6
            + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a**5 / 120
        )
        north = self.false_northing + _K0 * (
            m
            + n
            * tan_lat
            * (
                a**2 / 2
                + (5 - t + 9 * c + 4 * c**2) * a**4 / 24
                + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a**6 / 720
            )
        )
        return east, north

    def inverse(self, east, north):
        """(easting, northing) meters → (lon, lat) degrees."""
        x = np.asarray(east, dtype=np.float64) - _FALSE_E
        y = np.asarray(north, dtype=np.float64) - self.false_northing
        lon0 = np.radians(self.central_meridian_deg)

        m = y / _K0
        mu = m / (_A * _M1)
        fp = (
            mu
            + _P2 * np.sin(2 * mu)
            + _P3 * np.sin(4 * mu)
            + _P4 * np.sin(6 * mu)
            + _P5 * np.sin(8 * mu)
        )

        sin_fp, cos_fp, tan_fp = np.sin(fp), np.cos(fp), np.tan(fp)
        c1 = _EP2 * cos_fp**2
        t1 = tan_fp**2
        n1 = _A / np.sqrt(1 - _E2 * sin_fp**2)
        r1 = _A * (1 - _E2) / (1 - _E2 * sin_fp**2) ** 1.5
        d = x / (n1 * _K0)

        lat = fp - (n1 * tan_fp / r1) * (
            d**2 / 2
            - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
            + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2)
            * d**6
            / 720
        )
        lon = lon0 + (
            d
            - (1 + 2 * t1 + c1) * d**3 / 6
            + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
        ) / cos_fp
        lon_deg = np.degrees(lon)
        # normalize to [−180, 180): zone-1/60 grids otherwise return
        # longitudes past the antimeridian (matches pyproj's convention and
        # the swath inputs')
        lon_deg = (lon_deg + 180.0) % 360.0 - 180.0
        return lon_deg, np.degrees(lat)


class UTMResampler:
    """Nearest-neighbour swath→UTM-grid resampler (``tools.py:9-64`` parity).

    The UTM grid is derived from the swath extent at ``pixel_size`` meters; a
    cKDTree over swath UTM coordinates yields, per target cell, the index of
    the nearest swath pixel within ``radius_of_influence`` meters (reference
    default 10 km, ``tools.py:57``). The resulting ``index_map``/``valid``
    pair is a device-friendly gather plan: ``resample_image`` is a pure
    ``take`` + ``where`` and may be called with JAX arrays inside jit.
    """

    def __init__(self, lats, lons, pixel_size: float,
                 radius_of_influence: float = 10000.0,
                 source_valid=None):
        """``source_valid`` (optional bool mask, swath shape) excludes
        invalid swath pixels from BOTH the nearest-neighbour source set and
        the grid geometry (zone / extent / size) — the reference notebook's
        masked-array resample (masked lats/lons where ``aod < 0``, notebook
        cell 10) has exactly these semantics through pyresample, whose area
        is computed from the unmasked pixels only. Deriving the extent from
        masked-out pixels would let geolocation fill values (e.g. GMTCO's
        -999.3) blow the grid up to millions of cells."""
        self.pixel_size = float(pixel_size)
        lats = np.asarray(lats, dtype=np.float64)
        lons = np.asarray(lons, dtype=np.float64)
        src_idx = None
        if source_valid is not None:
            sv = np.asarray(source_valid, bool)
            src_idx = np.nonzero(sv.ravel())[0]
            if src_idx.size == 0:
                # degenerate: nothing to resample — 1×1 all-invalid plan.
                # Zone/hemisphere from the raw arrays would be derived
                # from geolocation FILLS (e.g. GMTCO's -999.3 → zone 44
                # south — the exact poisoning source_valid exists to
                # prevent) and then persisted as grid metadata; clamp to
                # physical ranges so the (meaningless but harmless)
                # metadata stays on-earth
                self.zone = utm_zone_of(np.clip(lons, -180.0, 180.0))
                self.south = bool(
                    np.mean(np.clip(lats, -90.0, 90.0)) < 0)
                self.proj = UTMProjection(self.zone, self.south)
                self.extent = (0.0, 0.0, self.pixel_size, self.pixel_size)
                self.x_size = self.y_size = 1
                self.cell_x = self.cell_y = self.pixel_size
                self.valid = np.zeros((1, 1), bool)
                self.index_map = np.zeros((1, 1), np.int32)
                return
            glats, glons = lats.ravel()[src_idx], lons.ravel()[src_idx]
        else:
            glats, glons = lats, lons
        self.zone = utm_zone_of(glons)
        self.south = bool(np.mean(glats) < 0)
        self.proj = UTMProjection(self.zone, self.south)

        # source UTM coordinates and grid extent: valid pixels only
        x, y = self.proj.forward(glons, glats)
        self.extent = (np.min(x), np.min(y), np.max(x), np.max(y))
        # clamp to >=1: a source set spanning under half a pixel in either
        # axis (e.g. a single valid retrieval in a fill-heavy granule with
        # source_valid) would otherwise round to a 0-size grid with NaN
        # cell sizes and crash far downstream in the detector
        self.x_size = max(
            1, int(np.round((self.extent[2] - self.extent[0]) / pixel_size)))
        self.y_size = max(
            1, int(np.round((self.extent[3] - self.extent[1]) / pixel_size)))
        if self.extent[2] <= self.extent[0]:
            self.extent = (self.extent[0], self.extent[1],
                           self.extent[0] + pixel_size, self.extent[3])
        if self.extent[3] <= self.extent[1]:
            self.extent = (self.extent[0], self.extent[1],
                           self.extent[2], self.extent[1] + pixel_size)

        # pyresample spaces x_size cells evenly over the EXTENT, so the
        # effective cell size is extent/size, not the nominal pixel_size
        # (they differ whenever the extent is not an integer multiple) —
        # using the nominal size would drift cell centers by up to half a
        # pixel near the far edges vs the reference grid (tools.py:33-50)
        self.cell_x = (self.extent[2] - self.extent[0]) / self.x_size
        self.cell_y = (self.extent[3] - self.extent[1]) / self.y_size

        txv, tyv = self._cell_centers()
        pts = np.column_stack([x.ravel(), y.ravel()])
        tree = cKDTree(pts)
        dist, idx = tree.query(
            np.column_stack([txv.ravel(), tyv.ravel()]),
            distance_upper_bound=radius_of_influence,
        )
        self.valid = np.isfinite(dist).reshape(self.y_size, self.x_size)
        idx = np.where(np.isfinite(dist), idx, 0)
        if src_idx is not None:
            idx = src_idx[idx]
        self.index_map = idx.reshape(self.y_size, self.x_size).astype(np.int32)

    def _cell_centers(self):
        """Meshgrid of target cell centers (row 0 = max northing, image
        convention) — the single source of the grid-center convention used
        by both the gather-plan query and :meth:`lonlats`."""
        tx = self.extent[0] + (np.arange(self.x_size) + 0.5) * self.cell_x
        ty = self.extent[3] - (np.arange(self.y_size) + 0.5) * self.cell_y
        return np.meshgrid(tx, ty)

    def resample_image(self, image, fill_value=-999.0):
        """Apply the precomputed gather plan. ``image`` may be a NumPy or JAX
        array of the swath shape; the op is jit/vmap-friendly."""
        flat = image.reshape(-1)
        out = flat[self.index_map]
        return _where(self.valid, out, fill_value)

    def lonlats(self):
        """(lon_grid, lat_grid) of the target cell centers — the notebook's
        ``area_def.get_lonlats()`` (cell 10), which feeds the fire bbox
        subset and per-fire pixel location on the resampled raster."""
        txv, tyv = self._cell_centers()
        lon, lat = self.proj.inverse(txv, tyv)
        return lon, lat

    def resample_points_to_utm(self, point_lats, point_lons):
        x, y = self.proj.forward(np.asarray(point_lons), np.asarray(point_lats))
        return list(zip(x, y))

    def resample_point_to_geo(self, point_y, point_x):
        return self.proj.inverse(point_x, point_y)


def _where(mask, a, fill):
    try:  # works for both numpy and jax arrays without importing jax here
        import jax.numpy as jnp

        if not isinstance(a, np.ndarray):
            return jnp.where(mask, a, fill)
    except ImportError:
        pass
    return np.where(mask, a, fill)
