"""Parallelism: device meshes, shardings, halo exchange."""

from plumekit.parallel.mesh import (
    make_mesh,
    data_sharding,
    spatial_sharding,
    replicated,
    AXES,
)
from plumekit.parallel.halo import exchange_halo_block, halo_pad

__all__ = ["make_mesh", "data_sharding", "spatial_sharding", "replicated",
           "AXES", "exchange_halo_block", "halo_pad"]
