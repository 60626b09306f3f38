"""Great-circle distances and pixel-index grids.

Semantics match the reference's ``haversine`` (triplicated at
``plume_identifier_basic.py:115-132``, ``plume_identifier_rg.py:77-94``,
``plume_identifier_gaussian_profile.py:66-83``; note the reference's Earth
radius there is 6367 km) and ``grid_indexes``
(``plume_identifier_rg.py:69-74``). Works on NumPy or JAX arrays.
"""

from __future__ import annotations

import numpy as np

#: Earth radius used by the reference's haversine (``plume_identifier_rg.py:93``).
HAVERSINE_RADIUS_KM = 6367.0


def haversine_km(lon1, lat1, lon2, lat2, *, xp=np):
    """Great-circle distance in km between points in decimal degrees.

    ``xp`` selects the array namespace (``numpy`` or ``jax.numpy``) so the same
    formula runs host-side and inside jitted device code.
    """
    lon1, lat1, lon2, lat2 = (xp.radians(v) for v in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = xp.sin(dlat / 2.0) ** 2 + xp.cos(lat1) * xp.cos(lat2) * xp.sin(dlon / 2.0) ** 2
    return 2.0 * HAVERSINE_RADIUS_KM * xp.arcsin(xp.sqrt(a))


def grid_indexes(shape):
    """(rows, cols) integer index grids for an image of ``shape`` (H, W)."""
    rows, cols = np.mgrid[0 : shape[0], 0 : shape[1]]
    return rows, cols
