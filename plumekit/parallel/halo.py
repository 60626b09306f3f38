"""Halo exchange for spatially-sharded rasters.

The image analogue of context-parallel ring exchange (SURVEY.md §2.2): a
(H, W, ...) tensor sharded over mesh axes (y, x) needs each shard to see
``halo`` rows/cols of its neighbours before running ops with spatial
receptive fields (convs, morphology). Implemented inside ``shard_map`` with
``lax.ppermute`` shifts along each mesh axis — two phases (rows then
columns); the second phase moves the already-exchanged row halos sideways,
which transports corner blocks correctly without diagonal sends.

Edge shards pad with ZEROS (``lax.ppermute``'s non-participant fill),
matching "SAME" conv semantics at the true image border. There is no fill
parameter — an op needing a different border identity (e.g. +inf for
min-erosion) must bias its input around zero instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from plumekit.parallel.compat import shard_map


def _shift(x, axis_name: str, direction: int):
    """ppermute by ±1 along a mesh axis; the boundary shard receives zeros."""
    n = lax.axis_size(axis_name)
    perm = [(i, i + direction) for i in range(n) if 0 <= i + direction < n]
    return lax.ppermute(x, axis_name, perm)


def exchange_halo_block(block, halo: int, axis_names=("y", "x")):
    """Inside shard_map: (h, w, ...) local block → (h + 2·halo, w + 2·halo,
    ...) with neighbour halos (zeros at mesh edges)."""
    if halo < 1:
        # block[-0:] would select the WHOLE block and double every shard
        raise ValueError(f"halo must be >= 1, got {halo}")
    if halo > min(block.shape[0], block.shape[1]):
        raise ValueError(
            f"halo {halo} exceeds the local block {block.shape[:2]}; "
            "use fewer shards or a larger image")
    ay, ax = axis_names
    # phase 1: rows. Sending my last rows "down" (+1) means every shard
    # receives its upper neighbour's last rows — the top halo; ppermute
    # fills non-receiving (edge) shards with zeros.
    top = _shift(block[-halo:], ay, +1)
    bot = _shift(block[:halo], ay, -1)
    block = jnp.concatenate([top, block, bot], axis=0)
    # phase 2: cols (includes the just-added row halos → corners travel too)
    left = _shift(block[:, -halo:], ax, +1)
    right = _shift(block[:, :halo], ax, -1)
    return jnp.concatenate([left, block, right], axis=1)


def halo_pad(mesh: Mesh, x, halo: int):
    """Host-callable: spatially sharded (H, W, ...) array → per-shard
    halo-extended blocks, returned stacked as a (ny, nx, h+2halo, w+2halo,
    ...) fully-addressable array for downstream shard-local compute. Most
    users want :func:`plumekit.infer.sharded.sharded_apply` instead."""
    ny = mesh.shape["y"]
    nx = mesh.shape["x"]
    if x.shape[0] % ny or x.shape[1] % nx:
        raise ValueError(
            f"array {x.shape[:2]} does not divide by the mesh "
            f"({ny}, {nx}); pad the raster first")

    def body(blk):
        return exchange_halo_block(blk, halo)[None, None]

    spec = P("y", "x") if x.ndim == 2 else P("y", "x", None)
    out_spec = (P("y", "x", None, None) if x.ndim == 2
                else P("y", "x", None, None, None))
    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=out_spec)
    return fn(x)
