"""Connected-component labelling on device.

The hottest classical op in the reference: the rg sweep labels the full image
once per threshold — 20 ``skimage.measure.label`` calls per scene
(``plume_identifier_rg.py:188-195``), and again per candidate plume
(``:243``). SURVEY.md §7 ranks a device CCL as hard part #1.

TPU-native design — *segmented-scan label propagation*:

1. every foreground pixel starts with a unique label = its flat pixel id;
   background holds a large sentinel;
2. each sweep applies (a) a 3×3 (or cross) neighbour-min relaxation, then
   (b) a segmented min-scan along every row and every column, both
   directions, where background pixels reset the scan segment — this
   propagates labels through an entire straight run in one
   ``lax.associative_scan`` instead of one pixel per step;
3. sweeps repeat under ``lax.while_loop`` until a fixed point.

Convergence takes O(#turns of the windiest component) sweeps — a handful for
plume-shaped regions — versus O(component diameter) for plain neighbour-min
relaxation. Labels converge to the minimum pixel id of each component
(+1, with 0 = background), which is stable and order-independent; use
:func:`component_sizes` for per-label stats without compaction.

Everything is shape-static and vmappable: the rg pipeline vmaps this over the
(T, H, W) threshold stack so all 20 labelings run as one XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

#: background value in returned label images
BACKGROUND = 0


def ccl_backend() -> str:
    """'pallas' on real TPU backends, 'xla' on cpu/gpu or when forced via
    ``PLUMEKIT_CCL=xla`` (escape hatch; both paths are bit-identical).

    NOTE: the choice is baked into each jitted program at TRACE time and
    those programs are cached (``cached_sweep_identifier``, ``jax.jit``) —
    set the env var before the first identify call in the process;
    flipping it later does not retrace already-compiled sweeps."""
    import os

    if os.environ.get("PLUMEKIT_CCL", "") == "xla":
        return "xla"
    return "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"


def ccl_unfused() -> bool:
    """True when ``PLUMEKIT_CCL=unfused`` asks for the round-4 opened-stack
    kernel instead of the fused-mask variants. Same trace-time caveat as
    :func:`ccl_backend`: the flag is baked into each jitted program when it
    is first traced — set it before the first identify call in the process.
    Beyond the VMEM scene gate there is no unfused Pallas variant, so the
    flag routes those scenes to the XLA scan path (a working escape hatch
    rather than a silent no-op)."""
    import os

    return os.environ.get("PLUMEKIT_CCL", "") == "unfused"

_SENTINEL = jnp.iinfo(jnp.int32).max


def _neighbor_min(lbl, mask, connectivity: int):
    pad = jnp.pad(lbl, 1, constant_values=_SENTINEL)
    h, w = lbl.shape
    best = lbl
    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    for dr, dc in offsets:
        best = jnp.minimum(best, lax.dynamic_slice(pad, (1 + dr, 1 + dc), (h, w)))
    return jnp.where(mask, best, _SENTINEL)


def _segmented_min_scan(lbl, barrier, axis: int, reverse: bool):
    """Min-scan along ``axis`` that restarts at barrier (background) cells."""

    def combine(a, b):
        v1, r1 = a
        v2, r2 = b
        return jnp.where(r2, v2, jnp.minimum(v1, v2)), r1 | r2

    v, _ = lax.associative_scan(
        combine, (lbl, barrier), axis=axis, reverse=reverse
    )
    return jnp.where(barrier, _SENTINEL, v)


def _sweep(lbl, mask, connectivity: int):
    barrier = ~mask
    lbl = _neighbor_min(lbl, mask, connectivity)
    lbl = _segmented_min_scan(lbl, barrier, axis=1, reverse=False)
    lbl = _segmented_min_scan(lbl, barrier, axis=1, reverse=True)
    lbl = _segmented_min_scan(lbl, barrier, axis=0, reverse=False)
    lbl = _segmented_min_scan(lbl, barrier, axis=0, reverse=True)
    return lbl


@partial(jax.jit, static_argnames=("connectivity", "max_sweeps", "hops"))
def connected_components(mask, connectivity: int = 2, max_sweeps: int = 256,
                         hops: int = 2, init_labels=None):
    """Label a (H, W) boolean mask. Returns int32 labels: 0 for background,
    ``min_pixel_id + 1`` for each component (stable, order-independent).

    ``connectivity=2`` matches skimage ``label``'s 2-D default (8-neighbour,
    used throughout the reference); ``connectivity=1`` is the 4-neighbour
    variant. ``max_sweeps`` bounds the while loop (unreachable for real
    masks; keeps compilation finite).

    Each iteration runs the scan sweep then ``hops`` rounds of *pointer
    jumping* (union-find path compression as a gather: a pixel adopts the
    label of the pixel its label names). Percolation-regime masks — one
    giant snaky component, e.g. low AOD thresholds — drop from hundreds of
    sweeps to O(log diameter): 216 → 18 measured on 1200² noise.

    ``init_labels`` warm-starts the fixpoint from the labels of a *subset*
    mask (this op's output format). Any pixel whose init label names a pixel
    in its own component is a valid upper bound, so labels computed at a
    tighter threshold seed the looser one and the loop only pays for the
    newly-added bridges — the lever behind the sweep pipeline's
    tightest→loosest scan.
    """
    h, w = mask.shape
    ids = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    if init_labels is None:
        init = jnp.where(mask, ids, _SENTINEL)
    else:
        seeded = jnp.where(init_labels > 0, init_labels - 1, ids)
        init = jnp.where(mask, seeded, _SENTINEL)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_sweeps)

    def body(state):
        lbl, _, it = state
        new = _sweep(lbl, mask, connectivity)
        flat = new.reshape(-1)
        for _ in range(hops):
            hopped = flat[jnp.clip(flat, 0, h * w - 1)]
            flat = jnp.where(flat == _SENTINEL, _SENTINEL, hopped)
        new = flat.reshape(h, w)
        return new, jnp.any(new != lbl), it + 1

    lbl, _, _ = lax.while_loop(cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(mask, lbl + 1, BACKGROUND)


def connected_components_host(mask, connectivity: int = 2):
    """Host oracle/fallback via ``scipy.ndimage.label`` with compact labels
    1..N (same partition as the device op; label *values* differ)."""
    from scipy import ndimage

    structure = np.ones((3, 3)) if connectivity == 2 else None
    labels, _ = ndimage.label(np.asarray(mask), structure=structure)
    return labels.astype(np.int32)


@partial(jax.jit, static_argnames=())
def component_sizes(labels):
    """Pixel count of every component, addressable by label value.

    Returns ``size_map`` of shape (H*W + 1,): ``size_map[l]`` is the size of
    the component labelled ``l`` (index 0 counts background). One
    ``segment_sum`` over the image — the device replacement for the
    reference's per-fire ``np.sum(labelled == label)`` scans
    (``plume_identifier_rg.py:193``).
    """
    h, w = labels.shape
    ones = jnp.ones((h * w,), dtype=jnp.int32)
    return jax.ops.segment_sum(
        ones, labels.reshape(-1), num_segments=h * w + 1
    )


def remove_small_components(labels, min_size: int):
    """Zero out components smaller than ``min_size`` px — device equivalent of
    ``skimage.morphology.remove_small_objects`` as used for fire-cluster
    rasters (``plume_identifier_gaussian_profile.py:132``)."""
    sizes = component_sizes(labels)
    keep = sizes[labels] >= min_size
    return jnp.where(keep & (labels != BACKGROUND), labels, BACKGROUND)
