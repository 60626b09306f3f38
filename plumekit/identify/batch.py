"""Data-parallel batch identification: granules sharded over a device mesh.

The reference's batch driver is a serial granule ``for`` loop
(``plume_identifier_rg.py:537``). The identify sweep is already one device
program per scene; at fleet scale the natural TPU-native batching is pure
data parallelism over granules — ``shard_map`` over the mesh's ``data``
axis, each device running the sweep (Pallas CCL kernel on TPU, XLA scan on
CPU) on its local shard of the granule stack. No collectives are needed
(scenes are independent); XLA simply compiles one per-device program, so N
chips process N granules per step.

Used by the multi-chip dry run and testable on the virtual 8-device CPU
mesh; the CLI's ``build_features`` stays the serial resumable driver (its
bottleneck here is host decode, not device compute).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plumekit.parallel.compat import shard_map

from functools import lru_cache

from plumekit.identify.pipeline import (
    SweepStatics,
    make_sweep_identifier,
    validate_descending_thresholds,
)


@lru_cache(maxsize=16)
def make_batch_identifier(statics: SweepStatics, mesh: Mesh,
                          axis: str = "data"):
    """Build ``fn(aod (B,H,W), null (B,H,W), thresholds (T,), rows (B,F),
    cols (B,F), valid (B,F)) -> dict of stacked outputs`` with the batch
    sharded over ``axis``. B must divide by the axis size. Cached on
    (statics, mesh, axis) so repeated driver calls reuse the jitted
    program instead of retracing (the sweep compile costs minutes cold)."""
    sweep = make_sweep_identifier(statics, jit=False)

    def local(aods, nulls, thresholds, rows, cols, valid):
        def one(args):
            aod, null, r, c, v = args
            return sweep(aod, aod, null, thresholds, r, c, v)

        # lax.map (sequential per device): granules run one-by-one locally,
        # in parallel across devices; a vmapped while_loop would make every
        # local granule pay the slowest one's sweep count
        return jax.lax.map(one, (aods, nulls, rows, cols, valid))

    spec = P(axis)
    rep = P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, rep, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)


def batch_identify_sharded(
    aods: np.ndarray,
    statics: SweepStatics,
    thresholds,
    fire_rows: np.ndarray,
    fire_cols: np.ndarray,
    fire_valid: np.ndarray,
    mesh: Mesh,
    null_masks=None,
    axis: str = "data",
):
    """Convenience driver: place the stacks batch-sharded on the mesh and
    run. ``aods`` (B, H, W); fire arrays (B, F). Pads B up to the
    ``axis`` size with empty scenes (dropped from the returned dict)."""
    # same guard every other entry point applies: the warm-started CCL
    # requires strictly descending thresholds (pipeline.py)
    thresholds = validate_descending_thresholds(thresholds)
    b = aods.shape[0]
    n = mesh.shape[axis]
    pad = (-b) % n
    if pad:
        def padb(x, fill=0):
            return np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)

        aods = padb(np.asarray(aods))
        fire_rows = padb(np.asarray(fire_rows))
        fire_cols = padb(np.asarray(fire_cols))
        fire_valid = padb(np.asarray(fire_valid).astype(bool), False)
        if null_masks is not None:
            null_masks = padb(np.asarray(null_masks).astype(bool), False)
    if null_masks is None:
        null_masks = np.zeros(aods.shape, bool)

    sharding = NamedSharding(mesh, P(axis))
    fn = make_batch_identifier(statics, mesh, axis)
    out = fn(
        jax.device_put(jnp.asarray(aods, jnp.float32), sharding),
        jax.device_put(jnp.asarray(null_masks), sharding),
        jnp.asarray(np.asarray(thresholds, np.float32)),
        jax.device_put(jnp.asarray(fire_rows), sharding),
        jax.device_put(jnp.asarray(fire_cols), sharding),
        jax.device_put(jnp.asarray(fire_valid), sharding),
    )
    return {k: np.asarray(v)[:b] for k, v in out.items()}
