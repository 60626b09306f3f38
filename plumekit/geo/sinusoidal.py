"""MODIS sinusoidal grid math.

The reference reconstructs a granule's lat/lon grid by regex-parsing the HDF4
``StructMetadata.0`` attribute for the UL/LR corner coordinates, building a
meter-space meshgrid, and converting sinusoidal → WGS84 with pyproj
(``tools.py:94-128``). Here the sinusoidal (un)projection is implemented in
closed form — the sinusoidal projection on a sphere of radius R is simply::

    x = R * lon * cos(lat)        y = R * lat        (lat/lon in radians)

so no PROJ dependency is needed. Grid construction reproduces the reference's
``np.linspace(x0, x0 + xinc * nx, nx)`` edge convention (``tools.py:120-121``)
bit-for-bit (including its slightly-wider-than-xinc sample spacing).
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np

#: Sphere radius of the MODIS sinusoidal projection
#: (``+proj=sinu +R=6371007.181``, ``tools.py:126``).
SINU_RADIUS_M = 6371007.181


def sinusoidal_to_wgs84(x, y, *, xp=np):
    """Meters in the MODIS sinusoidal grid → (lon, lat) in degrees.

    At the poles cos(lat) → 0: longitudes there are returned as NaN (the
    reference's pyproj path returns inf) rather than silently huge finite
    values that would poison downstream distance math; |y| beyond the
    polar extent also yields NaN lon."""
    lat = y / SINU_RADIUS_M
    cosl = xp.cos(lat)
    # invalid anywhere OUTSIDE the sinusoidal lens, not just at the exact
    # pole: |lat| beyond ±90° (off-earth y) and |x| beyond the parallel's
    # circumference both previously returned huge FINITE longitudes
    # (measured: lon = -449.7° just past the pole, 8.99e6° near it) —
    # precisely the poisoned values this guard claims to prevent. Polar
    # MODIS tiles (v00/v17) have rectangular-grid corners out there.
    invalid = ((xp.abs(lat) > xp.pi / 2 + 1e-12)
               | (xp.abs(cosl) < 1e-9)
               | (xp.abs(x) > SINU_RADIUS_M * xp.pi * xp.abs(cosl) + 1e-6))
    lon = xp.where(invalid, xp.nan,
                   x / (SINU_RADIUS_M * xp.where(invalid, 1.0, cosl)))
    return xp.degrees(lon), xp.degrees(xp.where(invalid, xp.nan, lat))


def wgs84_to_sinusoidal(lon_deg, lat_deg, *, xp=np):
    """(lon, lat) degrees → meters in the MODIS sinusoidal grid."""
    lat = xp.radians(lat_deg)
    lon = xp.radians(lon_deg)
    return SINU_RADIUS_M * lon * xp.cos(lat), SINU_RADIUS_M * lat


def grid_from_extent(
    x0: float, y0: float, x1: float, y1: float, ny: int, nx: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(lat, lon) 2-D grids for a granule with UL corner ``(x0, y0)`` and LR
    corner ``(x1, y1)`` in sinusoidal meters (``tools.py:116-128`` semantics).
    """
    xinc = (x1 - x0) / nx
    yinc = (y1 - y0) / ny
    x = np.linspace(x0, x0 + xinc * nx, nx)
    y = np.linspace(y0, y0 + yinc * ny, ny)
    xv, yv = np.meshgrid(x, y)
    lon, lat = sinusoidal_to_wgs84(xv, yv)
    return lat, lon


_UL_RE = re.compile(
    r"UpperLeftPointMtrs=\((?P<x>[+-]?\d+\.\d+),(?P<y>[+-]?\d+\.\d+)\)"
)
_LR_RE = re.compile(
    r"LowerRightMtrs=\((?P<x>[+-]?\d+\.\d+),(?P<y>[+-]?\d+\.\d+)\)"
)


def parse_struct_metadata(gridmeta: str) -> Tuple[float, float, float, float]:
    """Extract (x0, y0, x1, y1) from an HDF-EOS ``StructMetadata.0`` string
    (``tools.py:99-115`` semantics, whitespace-tolerant)."""
    meta = re.sub(r"\s", "", gridmeta)
    ul = _UL_RE.search(meta)
    lr = _LR_RE.search(meta)
    if ul is None or lr is None:
        raise ValueError("StructMetadata.0 missing UpperLeftPointMtrs/LowerRightMtrs")
    return (
        float(ul.group("x")),
        float(ul.group("y")),
        float(lr.group("x")),
        float(lr.group("y")),
    )
