"""Spatially-sharded whole-granule inference (SURVEY.md §2.2 "SP/CP" row).

One large raster is sharded over the mesh's (y, x) axes; each device extends
its block with a halo from its neighbours (``lax.ppermute`` ring exchange
over ICI, :mod:`plumekit.parallel.halo`), runs the U-Net forward on the
extended block, and crops the halo back off. With ``halo`` at least the
network's receptive-field radius the stitched output equals unsharded
inference except at true image borders (SURVEY.md §7 hard part #3) — the
raster analogue of halo-exchanged context parallelism.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plumekit.parallel.halo import exchange_halo_block, shard_map


def choose_halo(min_halo: int, block_h: int, depth: int) -> int:
    """Smallest halo ≥ min_halo making (block + 2·halo) divisible by
    2**depth (the U-Net's downsampling factor)."""
    div = 2**depth
    halo = min_halo
    while (block_h + 2 * halo) % div:
        halo += 1
    return halo


def make_sharded_infer(
    apply_fn: Callable,
    mesh: Mesh,
    halo: int,
    threshold: float = 0.5,
):
    """Build ``infer(variables, image (H, W, C)) -> (probs (H, W), mask)``
    with the image sharded over (y, x). H and W must divide by the mesh's
    y/x sizes and the per-block size plus 2·halo by the U-Net's 2**depth.
    ``apply_fn(variables, batch, train=False)`` → (B, h, w, 1) logits."""

    def block_forward(variables, block):
        if halo > min(block.shape[0], block.shape[1]):
            raise ValueError(
                f"halo {halo} exceeds per-shard block "
                f"{block.shape[:2]}; use fewer shards or a larger image"
            )
        padded = exchange_halo_block(block, halo)
        logits = apply_fn(variables, padded[None], train=False)[0]
        probs = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
        return probs[halo:-halo, halo:-halo]

    sharded = shard_map(
        block_forward,
        mesh=mesh,
        in_specs=(P(), P("y", "x", None)),
        out_specs=P("y", "x"),
        check_vma=False,
    )

    @jax.jit
    def infer(variables, image):
        image = jax.lax.with_sharding_constraint(
            image, NamedSharding(mesh, P("y", "x", None))
        )
        probs = sharded(variables, image)
        return probs, probs > threshold

    return infer
