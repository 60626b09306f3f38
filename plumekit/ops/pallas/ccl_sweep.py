"""Multi-threshold connected-component labelling as ONE Pallas TPU kernel.

The identify sweep's cost on the tunneled v5e is almost entirely relay
dispatch: each label-propagation sweep lowers to ~550 XLA ops (segmented
scans are log-depth op chains) and ~60 sweeps across 20 thresholds cost
~1.6 s/scene at 1200² — 45 µs/op of fixed overhead, not compute
(experiments/ccl_timing.py). This kernel runs the *entire* threshold stack
— warm-started labelling, all sweeps, convergence checks — inside a single
``pallas_call``, holding the label image in VMEM:

* grid = (T,); thresholds are processed tightest→loosest and the label
  scratch persists across grid steps, so each level warm-starts from the
  previous (nested) level's fixed point — same invariant as
  :func:`plumekit.ops.ccl.connected_components` ``init_labels``;
* a sweep is Gauss-Seidel over row blocks: 8-neighbour min, segmented
  min-scans along rows (both directions, ``pltpu.roll`` Hillis–Steele with
  barrier flags), and a segmented column scan in the pass direction — a
  top→bottom pass then a bottom→top pass, reading already-updated halo rows
  so label information crosses the whole image in one pass per direction;
* convergence is a per-level ``lax.while_loop`` on an any-changed flag.

Output labels are bit-identical to the XLA op: 0 background,
``min_pixel_id + 1`` per component (ids over the *unpadded* (H, W) grid).

Requires the masks to be NESTED (``masks[i] ⊆ masks[i+1]``) — exactly what
a descending threshold sweep of a monotone opening produces. The XLA path
(`ops.ccl`) remains the CPU/fallback implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# python int, not a jnp scalar: a traced constant would be "captured" by the
# kernel closure, which pallas_call rejects
_SENT = int(np.iinfo(np.int32).max)

#: halo rows kept around each row block (≥ 1 for the 3×3 stencil; 8 keeps
#: sublane slices aligned)
HALO = 8


def _roll(x, shift: int, axis: int, interpret: bool):
    if interpret:
        return jnp.roll(x, shift, axis)
    # pltpu.roll rejects negative shifts; a circular shift by -s ≡ n-s
    return pltpu.roll(x, shift=shift % x.shape[axis], axis=axis)


def _row_scan(v, barrier_i32, w_pad: int, reverse: bool, interpret: bool):
    """Segmented min-scan along lanes; barrier cells (flag 1) reset
    segments. Flags ride int32 — Mosaic cannot rotate i1 vectors."""
    rows = v.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (rows, w_pad), 1)
    f = barrier_i32
    s = 1
    while s < w_pad:
        if not reverse:
            vs = _roll(v, s, 1, interpret)
            fs = _roll(f, s, 1, interpret)
            wrapped = lane < s
        else:
            vs = _roll(v, -s, 1, interpret)
            fs = _roll(f, -s, 1, interpret)
            wrapped = lane >= w_pad - s
        vs = jnp.where(wrapped, _SENT, vs)
        fs = jnp.where(wrapped, 1, fs)
        v = jnp.where(f != 0, v, jnp.minimum(v, vs))
        f = jnp.maximum(f, fs)
        s *= 2
    return v


def _col_scan(v, barrier_i32, reverse: bool, interpret: bool):
    """Segmented min-scan along sublanes (within the block window)."""
    rows = v.shape[0]
    ridx = lax.broadcasted_iota(jnp.int32, v.shape, 0)
    f = barrier_i32
    s = 1
    while s < rows:
        if not reverse:
            vs = _roll(v, s, 0, interpret)
            fs = _roll(f, s, 0, interpret)
            wrapped = ridx < s
        else:
            vs = _roll(v, -s, 0, interpret)
            fs = _roll(f, -s, 0, interpret)
            wrapped = ridx >= rows - s
        vs = jnp.where(wrapped, _SENT, vs)
        fs = jnp.where(wrapped, 1, fs)
        v = jnp.where(f != 0, v, jnp.minimum(v, vs))
        f = jnp.maximum(f, fs)
        s *= 2
    return v


def _opened_slab(slab, th, b, ridx, lane, *, block: int, h: int, w: int,
                 w_pad: int, interpret: bool):
    """Opened threshold mask for block b's CENTER rows from a haloed
    (block + 2·HALO, w_pad) float32 AOD slab — bit-equal to
    ``binary_opening_cross(aod > th)`` restricted to the block (erosion
    border True at TRUE image borders, dilation border False, zero
    outside the (h, w) extent). Shared by the resident-fused and banded
    kernels."""
    rows = block + 2 * HALO
    gr = ridx + b * block - HALO              # global row of each slab row
    inside = (gr >= 0) & (gr < h) & (lane < w)
    m = (jnp.where(inside, slab, -jnp.inf) > th).astype(jnp.int32)

    def shifted(x, dr, dc):
        nb = x
        if dr:
            nb = _roll(nb, -dr, 0, interpret)
            edge = (ridx >= rows - dr) if dr > 0 else (ridx < -dr)
            nb = jnp.where(edge, 0, nb)
        if dc:
            nb = _roll(nb, -dc, 1, interpret)
            edge = (lane >= w_pad - dc) if dc > 0 else (lane < -dc)
            nb = jnp.where(edge, 0, nb)
        return nb

    ero = m
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        # a neighbour OUTSIDE the (h, w) image counts as foreground
        # (skimage erosion border_value=True)
        out_img = ~((gr + dr >= 0) & (gr + dr < h)
                    & (lane + dc >= 0) & (lane + dc < w))
        ero = ero & (shifted(m, dr, dc) | out_img.astype(jnp.int32))
    dil = ero
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        dil = dil | shifted(ero, dr, dc)
    return jnp.where(inside, dil, 0)[HALO:HALO + block]


def _kernel(th_sref, in_hbm, out_hbm, stats, lbl, mwin, stage, dirty,
            jbuf, sem_in, sem_out, sem_j, *, t_count: int, n_blk: int,
            block: int, h: int, w: int, w_pad: int, connectivity: int,
            max_sweeps: int, nested: bool, local_iters: int,
            jump_start: int, jump_every: int, jump_hops: int,
            jump_rstride: int, jump_cstride: int, fused: bool,
            lean_scans: bool, interpret: bool):
    t = pl.program_id(0)
    h_blk = n_blk * block

    if connectivity == 2:
        offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                   (1, -1), (1, 0), (1, 1)]
    else:
        offsets = [(-1, 0), (0, -1), (0, 1), (1, 0)]

    lane = lax.broadcasted_iota(jnp.int32, (block + 2 * HALO, w_pad), 1)

    @pl.when(t == 0)
    def _init_halos():
        lbl[pl.ds(0, HALO), :] = jnp.full((HALO, w_pad), _SENT, jnp.int32)
        lbl[pl.ds(HALO + h_blk, HALO), :] = jnp.full((HALO, w_pad), _SENT,
                                                     jnp.int32)

    # ---- init this level's labels (warm start from the previous level) ----
    def init_block(b, _):
        if fused:
            # in_hbm is the HALO-padded raw AOD plane; the opened mask is
            # built here from a haloed slab (threshold via scalar
            # prefetch) — the (T, H, W) opened stack never exists
            rows = block + 2 * HALO
            cp = pltpu.make_async_copy(
                in_hbm.at[pl.ds(b * block, rows), :], mwin, sem_in)
            cp.start()
            cp.wait()
            ridx = lax.broadcasted_iota(jnp.int32, (rows, w_pad), 0)
            op = _opened_slab(mwin[...], th_sref[t], b, ridx, lane,
                              block=block, h=h, w=w, w_pad=w_pad,
                              interpret=interpret)
        else:
            cp = pltpu.make_async_copy(
                in_hbm.at[t, pl.ds(b * block, block), :], mwin, sem_in
            )
            cp.start()
            cp.wait()
            op = mwin[...]
        prev = lbl[pl.ds(HALO + b * block, block), :]
        rr = lax.broadcasted_iota(jnp.int32, (block, w_pad), 0) + b * block
        cc = lax.broadcasted_iota(jnp.int32, (block, w_pad), 1)
        ids = rr * w + cc
        if nested:
            seed = jnp.where((t > 0) & (prev != _SENT), prev, ids)
        else:
            seed = ids
        lbl[pl.ds(HALO + b * block, block), :] = jnp.where(
            op != 0, seed, _SENT
        )
        dirty[b] = 1
        return 0

    lax.fori_loop(0, n_blk, init_block, 0)

    # ---- one block window relaxation (returns whether the center moved) --
    def relax_once(b, upward: bool):
        win = lbl[pl.ds(b * block, block + 2 * HALO), :]
        rows = block + 2 * HALO
        ridx = lax.broadcasted_iota(jnp.int32, (rows, w_pad), 0)
        barrier = win == _SENT
        cand = jnp.full_like(win, _SENT)
        for dr, dc in offsets:
            nb = win
            if dr:
                nb = _roll(nb, -dr, 0, interpret)
                # window-edge rows wrap to the opposite edge — values from
                # ~`block` rows away. The contaminated halo rows are never
                # written back, but the column scan would carry their values
                # into the center: blank them.
                if dr > 0:
                    nb = jnp.where(ridx >= rows - dr, _SENT, nb)
                else:
                    nb = jnp.where(ridx < -dr, _SENT, nb)
            if dc:
                nb = _roll(nb, -dc, 1, interpret)
                if dc > 0:
                    nb = jnp.where(lane >= w_pad - dc, _SENT, nb)
                else:
                    nb = jnp.where(lane < -dc, _SENT, nb)
            cand = jnp.minimum(cand, nb)
        new = jnp.where(barrier, _SENT, jnp.minimum(win, cand))
        bar32 = barrier.astype(jnp.int32)
        if lean_scans:
            # one row scan per visit, direction tied to the pass, so a
            # down+up pass still covers both horizontal directions —
            # ~30% cheaper per visit at possibly more passes (fixpoint
            # unchanged; measured per scene size)
            new = _row_scan(new, bar32, w_pad, reverse=upward,
                            interpret=interpret)
        else:
            new = _row_scan(new, bar32, w_pad, reverse=False,
                            interpret=interpret)
            new = _row_scan(new, bar32, w_pad, reverse=True,
                            interpret=interpret)
        new = _col_scan(new, bar32, reverse=upward, interpret=interpret)
        center_new = new[HALO:HALO + block]
        center_old = win[HALO:HALO + block]
        lbl[pl.ds(b * block + HALO, block), :] = center_new
        return jnp.any(center_new != center_old)

    # ---- worklist-gated block visit (round-5 swath-scale lever) ----------
    # A clean block's relaxation is a no-op by construction, so converged
    # blocks cost one SMEM flag read. Any change re-marks the block and
    # its row neighbours (labels cross block edges only through the halo
    # rows), so the long percolation tail — a label frontier snaking
    # through a handful of blocks for dozens of passes — stops paying for
    # the whole plane. Every relaxation order converges to the same
    # unique min-label fixpoint, so skipping preserves bit-parity.
    def process(b, upward: bool):
        @pl.when(dirty[b] != 0)
        def _visit():
            dirty[b] = 0
            ch_any = jnp.bool_(False)
            ch_last = jnp.bool_(False)
            for k in range(local_iters):
                # iteration k scans in the pass direction, then alternates
                # (within-block serpentines resolve locally instead of
                # costing one global pass per reversal)
                ch_last = relax_once(b, upward ^ (k % 2 == 1))
                ch_any = ch_any | ch_last

            @pl.when(ch_last)
            def _self():
                dirty[b] = 1   # not at local fixpoint yet

            @pl.when(ch_any)
            def _neigh():
                # clamped writes at the edges re-mark the block itself —
                # harmless extra visits on the two boundary blocks
                dirty[jnp.maximum(b - 1, 0)] = 1
                dirty[jnp.minimum(b + 1, n_blk - 1)] = 1

    def any_dirty():
        return lax.fori_loop(
            0, n_blk, lambda i, a: a | (dirty[i] != 0), jnp.bool_(False))

    # ---- sparse pointer jumping (round 5) --------------------------------
    # Near-percolation levels converge in O(alternation depth of the
    # component's min-propagation path) passes — measured 112 at 4096² —
    # because sweeps only transport labels geometrically. Labels are
    # pixel IDS, so dereferencing L[L[p]] teleports values across the
    # whole maze (the XLA path's pointer-jump trick, ops/ccl.py). A full
    # per-pixel gather is impossible in Mosaic and ~150 ms/hop in XLA
    # (measured, experiments/gather_probe.py), so jumps run SPARSELY: one
    # 8-row stripe of representatives per block, one per 128-lane group;
    # each rep's label value is dereferenced twice via (8, 128)-tile DMAs
    # (lane-aligned, sublane offsets free) + masked-reduce extraction,
    # and the rep takes the min. Values only shortcut within their own
    # component (a label names a pixel OF that component, and labels
    # monotonically decrease), so the unique fixpoint — and bit-parity —
    # is untouched; the next sweeps spread the teleported minima.
    n_rep_cols = w_pad // jump_cstride
    n_stripes = max(1, block // jump_rstride)

    def extract(tile8, r_idx, c_idx):
        """tile8[r_idx, c_idx] as a scalar via iota masking (arbitrary
        traced indices; single-element VMEM loads/slices are illegal)."""
        rr = lax.broadcasted_iota(jnp.int32, tile8.shape, 0)
        cc = lax.broadcasted_iota(jnp.int32, tile8.shape, 1)
        return jnp.sum(jnp.where((rr == r_idx) & (cc == c_idx), tile8, 0))

    def _addr(v):
        """lbl tile address of the pixel NAMED by label value v. DMA
        slice offsets must be PROVABLY tile-aligned (8, 128) — unlike
        vector-load slices, whose sublane offsets are free."""
        vr = v // w + HALO
        vc = v % w
        return (vr // 8) * 8, (vc // 128) * 128, vr, vc

    def deref(v):
        """Label of the pixel NAMED by label value v (one hop)."""
        r0, c0, vr, vc = _addr(v)
        cp = pltpu.make_async_copy(
            lbl.at[pl.ds(r0, 8), pl.ds(c0, 128)], jbuf, sem_j)
        cp.start()
        cp.wait()
        return extract(jbuf[...], vr - r0, vc - c0)

    def hook(v):
        """One pointer-jump-with-path-halving step rooted at value v:
        u1 = L[v]; u2 = L[u1]; L[v] <- min(L[v], u2). Writing the
        improvement back at PIXEL v (the basin-min pixel the chain runs
        through) is what makes chains contract exponentially — updating
        only the representatives leaves the intermediate chain nodes to
        geometric flooding (measured: rep density did not move the
        4096² pass count at all until this write-back existed). Returns
        the best value seen (for the representative's own update)."""
        r0, c0, vr, vc = _addr(v)
        cp = pltpu.make_async_copy(
            lbl.at[pl.ds(r0, 8), pl.ds(c0, 128)], jbuf, sem_j)
        cp.start()
        cp.wait()
        tile_a = jbuf[...]
        u1 = extract(tile_a, vr - r0, vc - c0)
        u2 = deref(u1)              # clobbers jbuf — tile_a already read

        @pl.when(u2 < u1)
        def _write_back():
            rr8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            cc8 = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            jbuf[...] = jnp.where(
                (rr8 == vr - r0) & (cc8 == vc - c0),
                jnp.minimum(tile_a, u2), tile_a)
            cpw = pltpu.make_async_copy(
                jbuf, lbl.at[pl.ds(r0, 8), pl.ds(c0, 128)], sem_j)
            cpw.start()
            cpw.wait()
            blk = jnp.clip((vr - HALO) // block, 0, n_blk - 1)
            dirty[blk] = 1
        return jnp.minimum(u1, u2)

    def jump_block(b, _):
        rr = lax.broadcasted_iota(jnp.int32, (8, w_pad), 0)
        cc = lax.broadcasted_iota(jnp.int32, (8, w_pad), 1)
        # stripe offset stays inside the block even when the stride
        # exceeds the block height (n_stripes=1 then)
        eff = min(jump_rstride, block)
        mid = max(0, eff // 2 - eff // 2 % 8)

        def one_stripe(s, _):
            # every term is a multiple of 8 (HALO, block, stride, mid are)
            # but Mosaic cannot prove it through the traced product — hint
            r0 = pl.multiple_of(
                HALO + b * block + s * jump_rstride + mid, 8)
            stripe = lbl[pl.ds(r0, 8), :]

            def one_rep(j, carry):
                stripe_u, improved = carry
                c_j = j * jump_cstride + jump_cstride // 2
                v = extract(stripe_u, 4, c_j)

                def live(_):
                    u = v
                    for _hop in range(jump_hops):
                        u = hook(u)
                    stripe_n = jnp.where((rr == 4) & (cc == c_j),
                                         jnp.minimum(stripe_u, u), stripe_u)
                    return stripe_n, improved | (u < v)

                return lax.cond(v != _SENT, live,
                                lambda _: (stripe_u, improved), 0)

            stripe_u, improved = lax.fori_loop(
                0, n_rep_cols, one_rep, (stripe, jnp.bool_(False)))

            @pl.when(improved)
            def _mark():
                # Min-merge, not a plain store: hook() write-backs may have
                # already landed inside these rows (a chain pixel can fall in
                # the rep stripe), and labels only ever decrease.
                lbl[pl.ds(r0, 8), :] = jnp.minimum(
                    lbl[pl.ds(r0, 8), :], stripe_u)
                dirty[b] = 1

            return 0

        lax.fori_loop(0, n_stripes, one_stripe, 0)
        return 0

    # ---- sweep to fixpoint: top→bottom then bottom→top Gauss-Seidel ------
    def sweep_cond(state):
        cont, it = state
        return cont & (it < max_sweeps)

    def sweep_body(state):
        _, it = state
        lax.fori_loop(0, n_blk,
                      lambda b, c: (process(b, upward=False), c)[1], 0)
        lax.fori_loop(0, n_blk,
                      lambda i, c: (process(n_blk - 1 - i, upward=True),
                                    c)[1], 0)
        if jump_every:
            @pl.when((it >= jump_start) & (it % jump_every == 0)
                     & any_dirty())
            def _jump():
                lax.fori_loop(0, n_blk, jump_block, 0)
        return any_dirty(), it + 1

    _, sweeps = lax.while_loop(sweep_cond, sweep_body,
                               (jnp.bool_(True), jnp.int32(0)))
    if stats is not None:
        stats[...] = jnp.full((1, 8, 128), sweeps, jnp.int32)

    # ---- emit external labels for this level ------------------------------
    def out_block(b, _):
        center = lbl[pl.ds(HALO + b * block, block), :]
        stage[:] = jnp.where(center != _SENT, center + 1, 0)
        cp = pltpu.make_async_copy(
            stage, out_hbm.at[t, pl.ds(b * block, block), :], sem_out
        )
        cp.start()
        cp.wait()
        return 0

    lax.fori_loop(0, n_blk, out_block, 0)


#: VMEM the kernel needs for an (h, w) scene: the whole label plane plus
#: two block slabs live in VMEM (scratch_shapes below)
_VMEM_BUDGET = 96 * 1024 * 1024


def sweep_fits_vmem(h: int, w: int, block: int = 128) -> bool:
    """True when the kernel's VMEM scratch for an (h, w) scene fits the
    budget — callers should fall back to the XLA CCL path otherwise
    (a too-large scene would die in the Mosaic compiler, not degrade).
    ~5000² scenes fit; the MAIAC native 1200² uses ~8 MB."""
    w_pad = ((w + 127) // 128) * 128
    h_blk = -(-h // block) * block
    scratch = (h_blk + 2 * HALO) * w_pad * 4 + 2 * block * w_pad * 4
    return scratch <= _VMEM_BUDGET


@partial(jax.jit, static_argnames=("connectivity", "block", "max_sweeps",
                                   "nested", "local_iters", "jump_start",
                                   "jump_every", "jump_hops", "jump_rstride",
                                   "jump_cstride", "lean_scans",
                                   "return_stats", "interpret"))
def multi_threshold_ccl(opened, connectivity: int = 2, block: int = 128,
                        max_sweeps: int | None = None, nested: bool = True,
                        local_iters: int = 1, jump_start: int = 8,
                        jump_every: int = 4, jump_hops: int = 2,
                        jump_rstride: int = 128, jump_cstride: int = 128,
                        lean_scans: bool = True,
                        return_stats: bool = False,
                        interpret: bool = False):
    """Label every mask of a nested (T, H, W) bool stack in one kernel.

    Equivalent to ``[connected_components(opened[i]) for i in range(T)]``
    (bit-identical labels) with the whole stack's sweeps fused into a single
    dispatched program. ``nested=True`` warm-starts level i+1 from level i's
    labels and REQUIRES ``opened[i] ⊆ opened[i+1]``; pass ``nested=False``
    for independent masks (each level then relaxes from scratch).

    Block visits are worklist-gated (round 5): converged row blocks cost
    one SMEM flag read per pass, so the near-percolation levels' long
    convergence tails — a label frontier wandering through a few blocks
    for dozens of passes — no longer pay for the whole plane each pass.
    ``local_iters`` > 1 additionally alternates the column-scan direction
    within one block visit, resolving within-block serpentines locally.
    Once a level exceeds ``jump_start`` passes, every ``jump_every``-th
    pass runs a SPARSE POINTER-JUMP round: a grid of representative
    pixels dereference their label values (labels are pixel ids) through
    two (8, 128)-tile DMAs each, teleporting minima across the maze —
    the log-depth escape for percolating levels whose geometric
    alternation depth is measured in the hundreds (``jump_every=0``
    disables). All three preserve bit-parity: min-label relaxation has a
    unique fixpoint, reached under any visit order, and jumps only adopt
    values from the representative's own component.

    ``max_sweeps`` (default ``max(256, h)``) caps each level's relaxation:
    every down+up pass carries information across the full image height, so
    real masks converge in a handful of passes (the per-level while_loop
    exits early), but an adversarial serpentine with more than ~max_sweeps
    direction reversals would be truncated silently — unlike the XLA path,
    which pointer-jumps. Raise the cap for pathological inputs.

    ``return_stats=True`` additionally returns a (T,) int32 vector of
    down+up pass counts per level (the convergence diagnostic).
    """
    t_count, h, w = opened.shape
    if block % 8:
        raise ValueError(
            f"block must be a multiple of 8 (Mosaic sublane slice-shape "
            f"rule), got {block}")
    if local_iters < 1:
        raise ValueError(f"local_iters must be >= 1, got {local_iters}")
    if jump_rstride % 8 or jump_cstride % 8:
        raise ValueError("jump_rstride/jump_cstride must be multiples of "
                         f"8, got {jump_rstride}/{jump_cstride}")
    if not sweep_fits_vmem(h, w, block):
        raise ValueError(
            f"scene {(h, w)} exceeds the kernel's VMEM budget; use the "
            "XLA connected_components path (sweep_fits_vmem gates this)")
    if max_sweeps is None:
        max_sweeps = max(256, h)
    w_pad = ((w + 127) // 128) * 128
    n_blk = -(-h // block)
    h_blk = n_blk * block

    op = jnp.pad(opened, ((0, 0), (0, h_blk - h), (0, w_pad - w)))
    op = op.astype(jnp.int32)

    return _call_resident(op, None, t_count, h, w, w_pad, n_blk, h_blk,
                          block, connectivity, max_sweeps, nested,
                          local_iters, jump_start, jump_every, jump_hops,
                          jump_rstride, jump_cstride, lean_scans,
                          return_stats, interpret, fused=False)


@partial(jax.jit, static_argnames=("connectivity", "block", "max_sweeps",
                                   "nested", "local_iters", "jump_start",
                                   "jump_every", "jump_hops", "lean_scans",
                                   "return_stats", "interpret"))
def multi_threshold_ccl_fused(aod, thresholds, connectivity: int = 2,
                              block: int = 128,
                              max_sweeps: int | None = None,
                              nested: bool = True, local_iters: int = 1,
                              jump_start: int = 8, jump_every: int = 4,
                              jump_hops: int = 2, lean_scans: bool = True,
                              return_stats: bool = False,
                              interpret: bool = False):
    """The VMEM-resident kernel with the threshold masks built IN-KERNEL
    from the raw (H, W) AOD plane (round 5): labels
    ``binary_opening_cross(aod > thresholds[t])`` for a DESCENDING (T,)
    threshold set without ever materialising the (T, H, W) opened stack —
    the XLA mask/opening phase (and its HBM stack traffic) disappears.
    Output is bit-identical to ``multi_threshold_ccl`` on the same
    stack. Scene-size gate: :func:`sweep_fits_vmem` (use the banded
    kernel beyond)."""
    h, w = aod.shape
    t_count = thresholds.shape[0]
    if block % 8:
        raise ValueError(f"block must be a multiple of 8, got {block}")
    if not sweep_fits_vmem(h, w, block):
        raise ValueError(
            f"scene {(h, w)} exceeds the kernel's VMEM budget; use "
            "multi_threshold_ccl_banded (no VMEM gate)")
    if max_sweeps is None:
        max_sweeps = max(256, h)
    w_pad = ((w + 127) // 128) * 128
    n_blk = -(-h // block)
    h_blk = n_blk * block
    a = jnp.pad(aod.astype(jnp.float32),
                ((HALO, h_blk - h + HALO), (0, w_pad - w)),
                constant_values=np.float32(-1e30))
    return _call_resident(a, thresholds.astype(jnp.float32), t_count, h,
                          w, w_pad, n_blk, h_blk, block, connectivity,
                          max_sweeps, nested, local_iters, jump_start,
                          jump_every, jump_hops, 128, 128, lean_scans,
                          return_stats, interpret, fused=True)


def _call_resident(inp, thresholds, t_count, h, w, w_pad, n_blk, h_blk,
                   block, connectivity, max_sweeps, nested, local_iters,
                   jump_start, jump_every, jump_hops, jump_rstride,
                   jump_cstride, lean_scans, return_stats, interpret,
                   fused):
    kern = partial(_kernel, t_count=t_count, n_blk=n_blk, block=block,
                   h=h, w=w, w_pad=w_pad, connectivity=connectivity,
                   max_sweeps=max_sweeps, nested=nested,
                   local_iters=local_iters, jump_start=jump_start,
                   jump_every=jump_every, jump_hops=jump_hops,
                   jump_rstride=jump_rstride, jump_cstride=jump_cstride,
                   fused=fused, lean_scans=lean_scans, interpret=interpret)
    out_shapes = [jax.ShapeDtypeStruct((t_count, h_blk, w_pad), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if return_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((t_count, 8, 128), jnp.int32))
        if fused:
            out_specs.append(pl.BlockSpec((1, 8, 128),
                                          lambda t, th: (t, 0, 0)))
        else:
            out_specs.append(pl.BlockSpec((1, 8, 128),
                                          lambda t: (t, 0, 0)))
    slab_shape = ((block + 2 * HALO, w_pad) if fused else (block, w_pad))
    slab_dtype = jnp.float32 if fused else jnp.int32
    scratch = [
        pltpu.VMEM((h_blk + 2 * HALO, w_pad), jnp.int32),   # labels
        pltpu.VMEM(slab_shape, slab_dtype),                 # mask/aod slab
        pltpu.VMEM((block, w_pad), jnp.int32),              # out staging
        pltpu.SMEM((n_blk,), jnp.int32),                    # worklist
        pltpu.VMEM((8, 128), jnp.int32),                    # jump tile
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        # the label plane for scenes beyond ~1700² exceeds the default
        # 16 MB scoped-vmem cap; budgeted by sweep_fits_vmem
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    if fused:
        if return_stats:
            def body(th, a_hbm, out_hbm, stats, *scratch_refs):
                return kern(th, a_hbm, out_hbm, stats, *scratch_refs)
        else:
            def body(th, a_hbm, out_hbm, *scratch_refs):
                return kern(th, a_hbm, out_hbm, None, *scratch_refs)
        out = pl.pallas_call(
            body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(t_count,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=params,
        )(thresholds, inp)
    else:
        if return_stats:
            def body(in_hbm, out_hbm, stats, *scratch_refs):
                return kern(None, in_hbm, out_hbm, stats, *scratch_refs)
        else:
            def body(in_hbm, out_hbm, *scratch_refs):
                return kern(None, in_hbm, out_hbm, None, *scratch_refs)
        out = pl.pallas_call(
            body,
            grid=(t_count,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=params,
        )(inp)
    if return_stats:
        labels, stats = out
        return labels[:, :h, :w], stats[:, 0, 0]
    return out[0][:, :h, :w]
