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


def choose_halo(min_halo: int, block_h: int, depth: int,
                block_w: int | None = None) -> int:
    """Smallest halo ≥ max(min_halo, 1) making (block + 2·halo) divisible
    by 2**depth (the U-Net's downsampling factor) for the height AND (when
    given) the width — non-square shards can have different residues, and
    a width that misses the divisibility fails deep inside apply_fn.
    Never returns 0: ``block[-0:]`` / ``probs[:-0]`` slicing semantics make
    a zero halo silently wrong, and make_sharded_infer rejects it."""
    div = 2**depth
    halo = max(min_halo, 1)
    # 2·halo only steps through even offsets, so block dims with odd div
    # residues (or mismatched residues mod div) can be unsatisfiable —
    # after div extra steps 2·halo has cycled every reachable residue class
    limit = halo + div
    while ((block_h + 2 * halo) % div
           or (block_w is not None and (block_w + 2 * halo) % div)):
        halo += 1
        if halo > limit:
            raise ValueError(
                f"no halo >= {max(min_halo, 1)} makes blocks "
                f"({block_h}, {block_w}) + 2*halo divisible by {div}; "
                "pad the image or choose a different shard grid")
    return halo


def make_sharded_infer(
    apply_fn: Callable,
    mesh: Mesh,
    halo: int,
    threshold: float = 0.5,
):
    """Build ``infer(variables, image (H, W, C)) -> (probs (H, W), mask)``
    with the image sharded over (y, x). H and W must divide by the mesh's
    y/x sizes and the per-block size plus 2·halo by the U-Net's 2**depth
    (use :func:`choose_halo` with both block dims).
    ``apply_fn(variables, batch, train=False)`` → (B, h, w, 1) logits."""
    if halo < 1:
        raise ValueError(
            "halo must be >= 1 (a zero halo would silently double the "
            "block through the -0 slice semantics); use choose_halo")

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
