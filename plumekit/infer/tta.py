"""Test-time augmentation: D4-symmetry-averaged serving.

The serving menu's quality dials so far trade *down* from the full model
(pruned columns) or move quality into a cheaper body (distillation);
TTA is the dial in the other direction — more quality for more compute
from the SAME checkpoint. Each tile batch is expanded to its 8 dihedral
views (4 rotations × optional flip), run through ONE forward at 8× the
batch, inverse-transformed, and the per-pixel plume probabilities
averaged. Plume appearance has no canonical orientation (smoke drifts
with the wind), so the D4 orbit is a label-preserving ensemble — the
classic segmentation TTA.

TPU-first shape: the 8 views FOLD INTO THE TILE BATCH (one (8·B, t, t,
C) forward) instead of 8 sequential dispatches — the MXU sees one large
batch, XLA fuses the rot90/flip relayouts into the surrounding program,
and the per-program dispatch tax is paid once. Composes with every
forward that honours the ``apply_fn(variables, batch) -> logits``
contract: bf16 flax, int8 quantized (the custom_vmap batch-fold rule is
orthogonal — TTA widens the tile axis, the fold handles the granule
axis), UNet++ and pruned columns.

The averaged probability is returned through the inverse-sigmoid so the
wrapper keeps the logits contract of :func:`make_sliding_infer`
(``sigmoid(logit(mean p)) == mean p`` — downstream stitching sees
standard mean-probability TTA exactly).

The reference has no model, hence no TTA (promised U-Net only,
``README.md:41-45``); measured quality/cost in BASELINE.md (TTA row).
"""

from __future__ import annotations

from typing import Callable

#: the 8 elements of D4 as (k_rot90, flip) pairs; inverse of (k, f) is
#: (-k mod 4, f) applied flip-first — flips and rotations don't commute,
#: so the inverse order matters
_D4 = [(k, f) for f in (False, True) for k in range(4)]


def make_tta_apply(apply_fn: Callable) -> Callable:
    """Wrap ``apply_fn`` in D4 test-time augmentation.

    The returned callable has the same contract (``(variables, (B, t, t,
    C), train=False) -> (B, t, t, 1)`` logits) at 8× the forward cost.
    Tiles must be square (rotations must preserve the shape) — enforced
    at trace time with a clear error."""
    import jax
    import jax.numpy as jnp

    def tta_apply(variables, x, train: bool = False):
        if x.ndim != 4 or x.shape[1] != x.shape[2]:
            raise ValueError(
                f"TTA needs square (B, t, t, C) tiles, got {x.shape}: "
                "90-degree rotations must preserve the tile shape")
        views = [x if not f else jnp.flip(x, axis=2) for k, f in _D4]
        views = [jnp.rot90(v, k=k, axes=(1, 2)) if k else v
                 for (k, f), v in zip(_D4, views)]
        logits = apply_fn(variables, jnp.concatenate(views, axis=0),
                          train=train)
        parts = jnp.split(logits, len(_D4), axis=0)
        back = []
        for (k, f), part in zip(_D4, parts):
            if k:
                part = jnp.rot90(part, k=-k, axes=(1, 2))
            if f:
                part = jnp.flip(part, axis=2)
            back.append(part)
        probs = jnp.mean(
            jax.nn.sigmoid(jnp.stack(back).astype(jnp.float32)), axis=0)
        # inverse sigmoid keeps the logits contract; the clip bounds the
        # logit at ~±16 (well past any decision threshold) instead of inf
        probs = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
        return jnp.log(probs) - jnp.log1p(-probs)

    return tta_apply


__all__ = ["make_tta_apply"]
