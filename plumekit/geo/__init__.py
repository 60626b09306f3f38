"""Geodesy & gridding — native replacements for the reference's pyproj /
pyresample usage (``src/features/tools.py``). Pure NumPy/JAX, no external
geodesy dependency."""

from plumekit.geo.distance import haversine_km, grid_indexes
from plumekit.geo.sinusoidal import (
    SINU_RADIUS_M,
    sinusoidal_to_wgs84,
    wgs84_to_sinusoidal,
    grid_from_extent,
    parse_struct_metadata,
)
from plumekit.geo.utm import UTMProjection, utm_zone_of, UTMResampler

__all__ = [
    "haversine_km",
    "grid_indexes",
    "SINU_RADIUS_M",
    "sinusoidal_to_wgs84",
    "wgs84_to_sinusoidal",
    "grid_from_extent",
    "parse_struct_metadata",
    "UTMProjection",
    "utm_zone_of",
    "UTMResampler",
]
