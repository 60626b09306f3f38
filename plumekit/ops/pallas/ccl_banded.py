"""Row-banded multi-threshold CCL for beyond-VMEM swaths (round 5).

The VMEM-resident kernel (:mod:`ccl_sweep`) holds the whole label plane
in VMEM and gates out around ~5000² (96 MB budget). This variant keeps
the label plane in HBM (the kernel's own output buffer) and streams one
row-band window through VMEM per block visit, so the scene ceiling moves
from VMEM (128 MB) to HBM — an 8192² VIIRS-class swath labels on one
chip, 16384² fits comfortably.

Second difference: the threshold masks are built IN-KERNEL from the raw
AOD plane (threshold from scalar prefetch, cross opening on a haloed
slab) — the (T, H, W) opened-mask stack never materialises anywhere.
At 8192²/T=20 that stack alone would be 5.4 GB of HBM traffic to write
+ read; the kernel reads the 268 MB AOD plane T times instead, and the
XLA-side mask/opening phase disappears from the pipeline entirely.

Worklist gating, sparse pointer jumps (with path-halving write-backs),
warm-started nested levels, and the min-label fixpoint argument are the
same as the resident kernel — labels are bit-identical to
``[connected_components(opened[t]) for t]`` (the interpret-mode test
matrix and the 1200² on-chip cross-check against the resident kernel
prove it).

Layout: ``out`` is (T, HALO + h_blk + HALO, w_pad) int32 — each level's
plane carries its own sentinel halo rows, sliced off on return. During
a level's sweeps the plane holds INTERNAL labels (pixel ids, _SENT
background); the final per-level emit pass converts to the external
``min_pixel_id + 1`` / 0 convention in place (the warm start of the
next level inverts it back — the two encodings are bijective).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plumekit.ops.pallas.ccl_sweep import (HALO, _SENT, _col_scan,
                                           _opened_slab, _roll, _row_scan)


def _kernel(th_sref, aod_hbm, out_hbm, stats, win, awin, stage, dirty,
            jbuf, sem_a, sem_w, sem_o, sem_j, *, t_count: int, n_blk: int,
            block: int, h: int, w: int, w_pad: int, connectivity: int,
            max_sweeps: int, jump_start: int, jump_every: int,
            jump_hops: int, lean_scans: bool, interpret: bool):
    t = pl.program_id(0)
    h_blk = n_blk * block
    rows = block + 2 * HALO

    if connectivity == 2:
        offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                   (1, -1), (1, 0), (1, 1)]
    else:
        offsets = [(-1, 0), (0, -1), (0, 1), (1, 0)]

    lane = lax.broadcasted_iota(jnp.int32, (rows, w_pad), 1)
    ridx = lax.broadcasted_iota(jnp.int32, (rows, w_pad), 0)

    def load_win(b):
        """out_hbm[t] rows [b·block, b·block + rows) → win (the window's
        center starts at HALO + b·block in the padded plane, so the slice
        base is b·block)."""
        cp = pltpu.make_async_copy(
            out_hbm.at[t, pl.ds(b * block, rows), :], win, sem_w)
        cp.start()
        cp.wait()

    def store_center(b, values):
        stage[...] = values
        cp = pltpu.make_async_copy(
            stage, out_hbm.at[t, pl.ds(HALO + b * block, block), :], sem_o)
        cp.start()
        cp.wait()

    # ---- in-kernel mask + cross opening from the raw AOD -----------------
    def opened_block(b):
        """Opened threshold mask for block b's center rows, built from a
        haloed AOD slab (shared helper — bit-equal to
        binary_opening_cross(aod > th))."""
        cp = pltpu.make_async_copy(
            aod_hbm.at[pl.ds(b * block, rows), :], awin, sem_a)
        cp.start()
        cp.wait()
        return _opened_slab(awin[...], th_sref[t], b, ridx, lane,
                            block=block, h=h, w=w, w_pad=w_pad,
                            interpret=interpret)

    # ---- init this level (warm start from level t-1's EXTERNAL labels) ---
    def init_block(b, _):
        op = opened_block(b)
        rr = lax.broadcasted_iota(jnp.int32, (block, w_pad), 0) + b * block
        cc = lax.broadcasted_iota(jnp.int32, (block, w_pad), 1)
        ids = rr * w + cc

        @pl.when(t > 0)
        def _warm():
            cp = pltpu.make_async_copy(
                out_hbm.at[t - 1, pl.ds(HALO + b * block, block), :],
                stage, sem_w)
            cp.start()
            cp.wait()

        @pl.when(t == 0)
        def _cold():
            stage[...] = jnp.zeros((block, w_pad), jnp.int32)

        prev = stage[...]
        seed = jnp.where((t > 0) & (prev != 0), prev - 1, ids)
        store_center(b, jnp.where(op != 0, seed, _SENT))
        dirty[b] = 1
        return 0

    # the level's own sentinel halo rows (top and bottom of the plane)
    stage[pl.ds(0, HALO), :] = jnp.full((HALO, w_pad), _SENT, jnp.int32)
    for off in (0, HALO + h_blk):
        cp_h = pltpu.make_async_copy(
            stage.at[pl.ds(0, HALO), :],
            out_hbm.at[t, pl.ds(off, HALO), :], sem_o)
        cp_h.start()
        cp_h.wait()

    lax.fori_loop(0, n_blk, init_block, 0)

    # ---- worklist-gated banded relaxation --------------------------------
    def relax_once(b, upward: bool):
        load_win(b)
        cur = win[...]
        barrier = cur == _SENT
        cand = jnp.full_like(cur, _SENT)
        for dr, dc in offsets:
            nb = cur
            if dr:
                nb = _roll(nb, -dr, 0, interpret)
                edge = (ridx >= rows - dr) if dr > 0 else (ridx < -dr)
                nb = jnp.where(edge, _SENT, nb)
            if dc:
                nb = _roll(nb, -dc, 1, interpret)
                edge = (lane >= w_pad - dc) if dc > 0 else (lane < -dc)
                nb = jnp.where(edge, _SENT, nb)
            cand = jnp.minimum(cand, nb)
        new = jnp.where(barrier, _SENT, jnp.minimum(cur, cand))
        bar32 = barrier.astype(jnp.int32)
        if lean_scans:
            # one row scan per visit, direction tied to the pass (the
            # round-5 lean mode: ~30% cheaper per pass, fixpoint
            # unchanged; measured 349 -> 240 ms at 4096² resident)
            new = _row_scan(new, bar32, w_pad, reverse=upward,
                            interpret=interpret)
        else:
            new = _row_scan(new, bar32, w_pad, reverse=False,
                            interpret=interpret)
            new = _row_scan(new, bar32, w_pad, reverse=True,
                            interpret=interpret)
        new = _col_scan(new, bar32, reverse=upward, interpret=interpret)
        center_new = new[HALO:HALO + block]
        changed = jnp.any(center_new != cur[HALO:HALO + block])

        @pl.when(changed)
        def _store():
            store_center(b, center_new)
        return changed

    def process(b, upward: bool):
        @pl.when(dirty[b] != 0)
        def _visit():
            dirty[b] = 0
            ch = relax_once(b, upward)

            @pl.when(ch)
            def _mark():
                dirty[b] = 1
                dirty[jnp.maximum(b - 1, 0)] = 1
                dirty[jnp.minimum(b + 1, n_blk - 1)] = 1

    def any_dirty():
        return lax.fori_loop(
            0, n_blk, lambda i, a: a | (dirty[i] != 0), jnp.bool_(False))

    # ---- sparse pointer jumps with path-halving hooks (HBM tiles) --------
    def _addr(v):
        vr = v // w + HALO
        vc = v % w
        return (vr // 8) * 8, (vc // 128) * 128, vr, vc

    def extract(tile8, r_i, c_i):
        rr8 = lax.broadcasted_iota(jnp.int32, tile8.shape, 0)
        cc8 = lax.broadcasted_iota(jnp.int32, tile8.shape, 1)
        return jnp.sum(jnp.where((rr8 == r_i) & (cc8 == c_i), tile8, 0))

    def deref(v):
        r0, c0, vr, vc = _addr(v)
        cp = pltpu.make_async_copy(
            out_hbm.at[t, pl.ds(r0, 8), pl.ds(c0, 128)], jbuf, sem_j)
        cp.start()
        cp.wait()
        return extract(jbuf[...], vr - r0, vc - c0)

    def hook(v):
        r0, c0, vr, vc = _addr(v)
        cp = pltpu.make_async_copy(
            out_hbm.at[t, pl.ds(r0, 8), pl.ds(c0, 128)], jbuf, sem_j)
        cp.start()
        cp.wait()
        tile_a = jbuf[...]
        u1 = extract(tile_a, vr - r0, vc - c0)
        u2 = deref(u1)

        @pl.when(u2 < u1)
        def _write_back():
            rr8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            cc8 = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            jbuf[...] = jnp.where((rr8 == vr - r0) & (cc8 == vc - c0),
                                  jnp.minimum(tile_a, u2), tile_a)
            cpw = pltpu.make_async_copy(
                jbuf, out_hbm.at[t, pl.ds(r0, 8), pl.ds(c0, 128)], sem_j)
            cpw.start()
            cpw.wait()
            dirty[jnp.clip((vr - HALO) // block, 0, n_blk - 1)] = 1
        return jnp.minimum(u1, u2)

    n_rep_cols = w_pad // 128

    def jump_block(b, _):
        r0 = HALO + b * block + (block // 2 - block // 2 % 8)
        cp = pltpu.make_async_copy(
            out_hbm.at[t, pl.ds(r0, 8), :], stage.at[pl.ds(0, 8), :],
            sem_j)
        cp.start()
        cp.wait()
        stripe = stage[pl.ds(0, 8), :]
        rr8 = lax.broadcasted_iota(jnp.int32, (8, w_pad), 0)
        cc8 = lax.broadcasted_iota(jnp.int32, (8, w_pad), 1)

        def one_rep(j, carry):
            stripe_u, improved = carry
            c_j = j * 128 + 64
            v = extract(stripe_u, 4, c_j)

            def live(_):
                u = v
                for _hop in range(jump_hops):
                    u = hook(u)
                return jnp.where((rr8 == 4) & (cc8 == c_j),
                                 jnp.minimum(stripe_u, u),
                                 stripe_u), improved | (u < v)

            return lax.cond(v != _SENT, live,
                            lambda _: (stripe_u, improved), 0)

        stripe_u, improved = lax.fori_loop(
            0, n_rep_cols, one_rep,
            (stripe, jnp.bool_(False)))

        @pl.when(improved)
        def _mark():
            # Re-fetch and min-merge before writing back: hook() write-backs
            # may have landed inside [r0, r0+8) since the stripe was staged,
            # and a plain store would revert them (labels only decrease).
            cpr = pltpu.make_async_copy(
                out_hbm.at[t, pl.ds(r0, 8), :], stage.at[pl.ds(0, 8), :],
                sem_j)
            cpr.start()
            cpr.wait()
            stage[pl.ds(0, 8), :] = jnp.minimum(
                stage[pl.ds(0, 8), :], stripe_u)
            cpw = pltpu.make_async_copy(
                stage.at[pl.ds(0, 8), :], out_hbm.at[t, pl.ds(r0, 8), :],
                sem_j)
            cpw.start()
            cpw.wait()
            dirty[b] = 1
        return 0

    # ---- sweep to fixpoint ----------------------------------------------
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

    # ---- emit: internal -> external labels in place ----------------------
    def out_block(b, _):
        cp = pltpu.make_async_copy(
            out_hbm.at[t, pl.ds(HALO + b * block, block), :], stage, sem_w)
        cp.start()
        cp.wait()
        cur = stage[...]
        store_center(b, jnp.where(cur != _SENT, cur + 1, 0))
        return 0

    lax.fori_loop(0, n_blk, out_block, 0)


@partial(jax.jit, static_argnames=("connectivity", "block", "max_sweeps",
                                   "jump_start", "jump_every", "jump_hops",
                                   "lean_scans", "return_stats",
                                   "interpret"))
def multi_threshold_ccl_banded(aod, thresholds, connectivity: int = 2,
                               block: int = 128,
                               max_sweeps: int | None = None,
                               jump_start: int = 8, jump_every: int = 4,
                               jump_hops: int = 2, lean_scans: bool = True,
                               return_stats: bool = False,
                               interpret: bool = False):
    """Label ``binary_opening_cross(aod > thresholds[t])`` for every level
    of a DESCENDING (T,) threshold set, entirely on device, with the label
    plane in HBM — the beyond-VMEM swath path. Returns (T, H, W) int32
    labels bit-identical to the XLA/resident-kernel convention."""
    h, w = aod.shape
    t_count = thresholds.shape[0]
    if block % 8:
        raise ValueError(f"block must be a multiple of 8, got {block}")
    if max_sweeps is None:
        max_sweeps = max(256, h)
    w_pad = ((w + 127) // 128) * 128
    n_blk = -(-h // block)
    h_blk = n_blk * block

    # HALO rows of -inf-class AOD padding top and bottom so slab DMAs
    # never leave the buffer; padded values threshold to background
    a = jnp.pad(aod.astype(jnp.float32),
                ((HALO, h_blk - h + HALO), (0, w_pad - w)),
                constant_values=np.float32(-1e30))

    kern = partial(_kernel, t_count=t_count, n_blk=n_blk, block=block,
                   h=h, w=w, w_pad=w_pad, connectivity=connectivity,
                   max_sweeps=max_sweeps, jump_start=jump_start,
                   jump_every=jump_every, jump_hops=jump_hops,
                   lean_scans=lean_scans, interpret=interpret)
    out_shapes = [jax.ShapeDtypeStruct(
        (t_count, h_blk + 2 * HALO, w_pad), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if return_stats:
        out_shapes.append(jax.ShapeDtypeStruct((t_count, 8, 128),
                                               jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda t, th: (t, 0, 0)))
        body = kern
    else:
        def body(th_sref, aod_hbm, out_hbm, *scratch):
            return kern(th_sref, aod_hbm, out_hbm, None, *scratch)
    rows = block + 2 * HALO
    out = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_count,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((rows, w_pad), jnp.int32),     # label window
                pltpu.VMEM((rows, w_pad), jnp.float32),   # aod slab
                pltpu.VMEM((block, w_pad), jnp.int32),    # staging
                pltpu.SMEM((n_blk,), jnp.int32),          # worklist
                pltpu.VMEM((8, 128), jnp.int32),          # jump tile
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(thresholds.astype(jnp.float32), a)
    if return_stats:
        labels, stats = out
        return labels[:, HALO:HALO + h, :w], stats[:, 0, 0]
    return out[0][:, HALO:HALO + h, :w]


__all__ = ["multi_threshold_ccl_banded"]
