"""The whole U-Net inference forward as ONE Pallas TPU megakernel.

Motivation (docs/performance.md): on this platform each dispatched HLO op
carries a large fixed runtime cost, so the ~60-op XLA forward (and the
~5-ops-per-block fused path) pays a dispatch tax on top of compute — the
same finding that took the identify sweep from 1634 ms to 72 ms when its
threshold stack became one kernel (ops/pallas/ccl_sweep.py). This kernel
runs *every* level of the U-Net — double convs, 2×2 max pools, 2×2/stride-2
transposed-conv upsampling, skip joins and the 1×1 head — inside a single
``pallas_call``: grid = (batch,), one tile per program, all weights
VMEM-resident, activations never touching HBM.

Design (constraints found by construction against the v5e Mosaic compiler;
every primitive below was probed on-chip before use):

* every level's activation lives as a **flattened embedded plane**
  ``(L·period, C)``: pixel (a, b) at flat ``(a+2)·period + (b+2)`` with a
  2-px zero halo ring; ``period`` is the padded sublane width. A 3×3-conv
  tap is then a contiguous sublane slice at offset ``a·period + b``
  (sublane slice *shapes* must be multiples of 8; offsets are free).
* **shallow levels use grouped im2col**: at C<128 a per-tap matmul wastes
  the MXU (K=N=C), so the taps of each kernel row are lane-concatenated
  into K=3C (or 9C) patches. Mosaic lowers concats of *8-aligned ref
  loads* only — not of shifted views — so im2col sources are staged
  through **3-shifted VMEM refs** (``ref[b]`` holds ``plane[q+b]``), which
  makes every tap load 8-aligned.
* **pooling** is a shift-max (sublane pairs), a free ``(lead/2, 2, ·, ·)``
  reshape-max (lead pairs), then K-row-batched **block-diagonal selection
  matmuls** ``S_K @ tall`` that compact even columns directly into the
  next level's embedded positions. Plain 2D matmuls on static value
  slices — Mosaic's 3-D dot_general does not lower beyond toy shapes
  (large/narrow cases fail or hang the compiler; probed).
* **upsampling**: four stride-2 taps as plain matmuls ``tall @ k[du,dv]``,
  block-diagonal expansion matmuls ``E_K`` for the column parity, and a
  free stack+reshape interleave for the row parity. The skip join never
  materialises a concat: the decoder's first conv splits its weights into
  a skip half and an up half accumulated into one fp32 accumulator.
* planes are assembled from the matmul pieces by axis-0 concatenation of
  8-row-aligned blocks (zero ring blocks included), so halo rings are
  zero by construction.
* input tiles are DMA'd from HBM with two-slot double buffering (tile i+1
  prefetches under tile i's matmuls), three shifted copies per tile for
  the first conv's aligned im2col loads.

Numerics: bf16 activations, fp32 accumulation in every matmul, inference
BatchNorm folded to scale/shift — the same contract as
:mod:`plumekit.models.fused_forward`, which remains the per-block
reference implementation and the parity oracle.

Replaces: the promised-but-absent reference model layer (reference
``README.md:1-4``, empty ``src/models/``); BASELINE.json north star
("lowered to fused Pallas conv+BN+ReLU kernels in bf16").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# geometry
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class _Lvl:
    """Static per-level geometry: image extents (lead = rows on the leading
    dim, sub = cols on the sublane dim), padded sublane ``period``,
    embedded leading extent ``L`` and double-conv channel widths."""

    lead: int
    sub: int
    period: int
    L: int
    cin: int
    cmid: int
    cout: int

    @property
    def flat(self) -> int:          # embedded plane rows
        return self.L * self.period

    @property
    def m_body(self) -> int:        # conv output rows (8 slack for pooling)
        return self.lead * self.period + 8

    @property
    def m_mid(self) -> int:         # conv1 intermediate rows (1-px halo)
        return (self.lead + 2) * self.period + 16


def _mk_geom(lead: int, sub: int, cin: int, cmid: int, cout: int) -> _Lvl:
    period = ((sub + 4 + 7) // 8) * 8
    # conv1 reads up to offset 2·period+2 + m_mid = (lead+4)·period + 18
    L = lead + 4 + -(-18 // period)
    return _Lvl(lead, sub, period, L, cin, cmid, cout)


def _levels(h: int, w: int, depth: int, cin: int, feats: int) -> List[_Lvl]:
    """Encoder levels 0..depth-1 then the bottleneck at index depth."""
    lvls = []
    lead, sub = h, w
    c_in = cin
    f = feats
    for _ in range(depth):
        lvls.append(_mk_geom(lead, sub, c_in, f, f))
        lead, sub = lead // 2, sub // 2
        c_in, f = f, f * 2
    lvls.append(_mk_geom(lead, sub, c_in, f, f))  # bottleneck
    return lvls


def _group(cin: int) -> int:
    """im2col tap-group size: 9 taps grouped into ONE matmul whenever the
    patch width K = 9·cin stays MXU-reasonable (the MXU accumulates K>128
    internally; one wide matmul beat nine narrow ones by ~5% end-to-end),
    else per-tap matmuls (cin > 256, and the DMA slot source whose
    unaligned loads cannot concat). Sources must be 3-shifted refs
    (aligned loads) for g=9."""
    return 9 if 9 * cin <= 2304 else 1


def _kdiv(n: int) -> int:
    """Row-batch size for the pool/up block-diagonal matmuls."""
    for k in (8, 6, 4, 3, 2):
        if n % k == 0:
            return k
    return 1


# --------------------------------------------------------------------------
# in-kernel building blocks (pure functions over refs/values + static geom)
# --------------------------------------------------------------------------

def _iota_col(n: int):
    return lax.broadcasted_iota(jnp.int32, (n, 1), 0)


def _make_load(src):
    """Tap-load factory. ``src`` is one of
    ("ref3", ref)        — 3-shifted staging ref: ref[b] holds plane[q+b]
    ("slot", ref, slot)  — the double-buffered input window
    ("ref", ref)         — plain plane ref (unaligned loads are legal alone)
    ("val", value)       — a live value (static slices only; g must be 1)
    Returns load(a_off, b, n) yielding plane[a_off + b : +n].
    """
    kind = src[0]
    if kind == "ref3":
        ref = src[1]
        return lambda a, b, n: ref[b, pl.ds(a, n)]
    if kind == "slot":
        ref, slot = src[1], src[2]
        return lambda a, b, n: ref[slot, pl.ds(a + b, n)]
    if kind == "ref":
        ref = src[1]
        return lambda a, b, n: ref[pl.ds(a + b, n)]
    val = src[1]
    return lambda a, b, n: val[a + b:a + b + n]


def _conv_taps(sources, g: int, period: int, n_rows: int, cout: int):
    """Accumulate the 9 taps of a 3×3 conv from one or more sources.

    ``w_ref`` is packed per group size ``g``: g=9 → (1, 9·Cin, Cout) one
    im2col matmul; g=3 → (3, 3·Cin, Cout) one matmul per kernel row;
    g=1 → (9, Cin, Cout) per-tap matmuls. Multiple sources realise the
    decoder's concat-free skip join (split conv1 weights)."""
    acc = jnp.zeros((n_rows, cout), jnp.float32)
    for src, w_ref in sources:
        load = _make_load(src)
        if g == 9:
            patches = jnp.concatenate(
                [load(a * period, b, n_rows) for a in range(3)
                 for b in range(3)], axis=1)
            acc = acc + jnp.dot(patches, w_ref[0],
                                preferred_element_type=jnp.float32)
        else:
            for a in range(3):
                for b in range(3):
                    acc = acc + jnp.dot(load(a * period, b, n_rows),
                                        w_ref[3 * a + b],
                                        preferred_element_type=jnp.float32)
    return acc


def _stage3(ref, plane, n_rows: int):
    """Store a plane value into a 3-shifted staging ref: ref[b] = plane[b:],
    making every later tap load 8-aligned (offsets a·period)."""
    for b in range(3):
        ref[b, pl.ds(0, n_rows)] = plane[b:b + n_rows]


def _double_conv(lvl: _Lvl, sources1, s1, b1, w2_ref, s2, b2, w_ref,
                 dtype, *, want_f32: bool = False, emit_mid=None):
    """(conv3x3 + folded-BN + ReLU) × 2 on an embedded plane.

    ``sources1``: conv1 tap sources (encoder: one; decoder: skip + up).
    ``w_ref``: the level's 3-shifted workspace for staging the conv1
    intermediate when conv2 runs grouped im2col (Cmid < 128), else None.
    Returns the masked body (lead·period + 8, Cout): pixel (a, b) at
    ``a·period + b``, halo wrap/garbage zeroed.
    """
    P, lead, sub = lvl.period, lvl.lead, lvl.sub
    m_mid, m_body = lvl.m_mid, lvl.m_body

    # the DMA slot window holds one copy only, so its tap loads sit at
    # unaligned offsets — Mosaic cannot concat those; stay per-tap there
    g1 = 1 if any(s[0] == "slot" for s, _ in sources1) else _group(lvl.cin)
    acc1 = _conv_taps(sources1, g1, P, m_mid, lvl.cmid)
    inter = jnp.maximum(
        acc1 * s1[:].astype(jnp.float32) + b1[:].astype(jnp.float32), 0.0)
    q = _iota_col(m_mid)
    a_i = q // P - 1
    b_i = q % P - 1
    ok = (a_i >= 0) & (a_i < lead) & (b_i >= 0) & (b_i < sub)
    # arithmetic mask, not jnp.where: broadcasting a (n, 1) i1 vector
    # against (n, C) takes Mosaic through the replicated-lane relayout
    # that misbehaves on v5e (crash in _upsample; silent sparse corruption
    # here, found by the stage bisect). Pre-mask values are finite, so
    # multiply-by-{0,1} is exact.
    inter = (inter * ok.astype(jnp.float32)).astype(dtype)
    if emit_mid is not None:        # debug cut: emit conv1, skip conv2
        emit_mid(inter)
        return None

    g2 = _group(lvl.cmid)
    if g2 == 1:
        src2 = ("val", inter)
    else:
        _stage3(w_ref, inter, m_mid - 8)
        src2 = ("ref3", w_ref)
    acc2 = _conv_taps([(src2, w2_ref)], g2, P, m_body, lvl.cout)
    body = jnp.maximum(
        acc2 * s2[:].astype(jnp.float32) + b2[:].astype(jnp.float32), 0.0)
    q = _iota_col(m_body)
    ok = (q % P < sub) & (q // P < lead)
    body = body * ok.astype(jnp.float32)   # same relayout hazard as above
    return body if want_f32 else body.astype(dtype)


def _assemble(pieces, lvl: _Lvl, dtype):
    """Concatenate ring + piece values into a full embedded plane value.

    DEBUG-ONLY (dbg emits): storing or slicing a multi-piece concatenated
    value corrupts scattered sublane tiles near internal seams on v5e
    Mosaic (found by the on-chip stage bisect: the staged-reload planes
    diverged while the directly-emitted value was exact, with ≥4-piece
    concats affected and 2-piece ones not). The compute path therefore
    never builds this value — pieces are stored individually
    (:func:`_store_pieces`)."""
    c = pieces[0][1].shape[-1]
    top = jnp.zeros((pieces[0][0], c), dtype)
    end = pieces[-1][0] + pieces[-1][1].shape[0]
    bot = jnp.zeros((lvl.flat - end, c), dtype)
    return jnp.concatenate([top] + [v for _, v in pieces] + [bot], axis=0)


def _store_pieces(ref, pieces, shift3: bool):
    """Store (plane_offset, value) pieces into a staging ref whose halo
    rings were zeroed once at t==0. ``shift3``: 3-shifted ref
    (``ref[b][q] = plane[q+b]``, so piece at plane offset ``o`` lands at
    ``o−b``); else a plain single-copy plane ref. Piece row counts are
    multiples of 8 (sublane store-shape rule); offsets are free."""
    if shift3:
        for b in range(3):
            for off, v in pieces:
                ref[b, pl.ds(off - b, v.shape[0])] = v
    else:
        for off, v in pieces:
            ref[pl.ds(off, v.shape[0])] = v


def _pool(body, lvl: _Lvl, nxt: _Lvl, s_ref, k: int, dtype):
    """2×2 max pool + halo embedding: sublane pairs via a +1-shifted max,
    lead pairs via a free reshape-max, column compaction + embedding via
    K-row-batched block-diagonal selection matmuls (statically unrolled).
    Returns (plane_offset, piece) pairs for :func:`_store_pieces`."""
    m = lvl.lead * lvl.period
    cm = jnp.maximum(body[0:m], body[1:m + 1])
    cm = cm.reshape(lvl.lead // 2, 2, lvl.period, -1)
    rp = jnp.maximum(cm[:, 0], cm[:, 1]).reshape(
        (lvl.lead // 2) * lvl.period, -1)
    pieces = []
    for r0 in range(0, lvl.lead // 2, k):
        tall = rp[r0 * lvl.period:(r0 + k) * lvl.period]
        pieces.append((
            (2 + r0) * nxt.period,
            jnp.dot(s_ref[...], tall,
                    preferred_element_type=jnp.float32).astype(dtype)))
    return pieces


def _upsample(body, prv: _Lvl, tgt: _Lvl, kt_ref, ctb, e0_ref, e1_ref,
              k: int, dtype):
    """2×2 stride-2 transposed conv + halo embedding: four tap matmuls per
    row batch, block-diagonal expansion matmuls for the column parity, a
    free stack+reshape interleave for the row parity. Bias is added and
    the image region masked per piece. Returns (plane_offset, piece)."""
    P_p, P_t = prv.period, tgt.period
    pieces = []
    for u0 in range(0, prv.lead, k):
        tall = body[u0 * P_p:(u0 + k) * P_p]
        rows = []
        for du in (0, 1):
            y0 = jnp.dot(tall, kt_ref[2 * du],
                         preferred_element_type=jnp.float32).astype(dtype)
            y1 = jnp.dot(tall, kt_ref[2 * du + 1],
                         preferred_element_type=jnp.float32).astype(dtype)
            o = (jnp.dot(e0_ref[...], y0,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(e1_ref[...], y1,
                           preferred_element_type=jnp.float32))
            rows.append(o.astype(dtype).reshape(k, P_t, -1))
        v = jnp.stack(rows, axis=1).reshape(2 * k * P_t, -1)
        off = (2 + 2 * u0) * P_t
        q = _iota_col(2 * k * P_t) + off
        a_i = q // P_t
        b_i = q % P_t
        ok = ((a_i >= 2) & (a_i < 2 + tgt.lead) & (b_i >= 2)
              & (b_i < 2 + tgt.sub))
        # cast the (rows, 1) mask before broadcasting against (1, C):
        # Mosaic cannot relayout broadcast i1 vectors (same class as the
        # CCL kernel's int32 scan flags)
        pieces.append((off, v + ctb[:] * ok.astype(dtype)))
    return pieces


# --------------------------------------------------------------------------
# the megakernel + host wrapper
# --------------------------------------------------------------------------

def _staged(lvl: _Lvl) -> bool:
    """Levels whose convs run grouped im2col need a 3-shifted workspace."""
    return _group(lvl.cout) > 1 or _group(lvl.cmid) > 1


def _dbg_rows(dbg: str, lvls: Sequence[_Lvl], depth: int) -> int:
    """Row extent of the intermediate plane named by a debug stage tag."""
    kind, l = dbg[0], int(dbg[1:] or depth)
    if kind == "e":                      # encoder body at level l
        return lvls[l].m_body
    if kind in ("i", "j"):               # conv1 intermediate (enc/dec)
        return lvls[l].m_mid
    if kind in ("s", "y", "z"):          # staged emb reload, shift 0/1/2
        return lvls[l + 1].flat - 8
    if kind == "c":                      # conv1 im2col patch matrix
        return lvls[l].m_mid
    if kind == "m":                      # pooled embedding into level l+1
        return lvls[l + 1].flat
    if kind == "b":                      # bottleneck body
        return lvls[depth].m_body
    if kind == "u":                      # upsampled plane at level l
        return lvls[l].flat
    return lvls[l].m_body                # "d": decoder body at level l


def mega_forward(x_emb, named_ws, lvls: Sequence[_Lvl], depth: int,
                 dtype, interpret: bool, dbg: str | None = None):
    """Run the megakernel. ``x_emb``: (B, n_in+8, 128) embedded input
    planes (lanes = the physical tile width; narrower HBM arrays cannot be
    DMA-sliced);
    ``named_ws``: dict name → operand (see ``make_mega_apply``). Returns
    (B, lead0·period0, 8) fp32 logit planes.

    ``dbg``: emit an intermediate plane instead of the logits (lane-padded
    to 128, fp32) — the Mosaic-vs-interpret bisect instrument: "e{l}" /
    "m{l}" encoder body / pooled embedding, "b" bottleneck, "u{l}" /
    "d{l}" decoder upsample / body."""
    b = x_emb.shape[0]
    n_in = 2 * lvls[0].period + lvls[0].m_mid
    m_head = lvls[0].lead * lvls[0].period
    if dbg is not None:
        m_out, c_out = _dbg_rows(dbg, lvls, depth), 128
    else:
        m_out, c_out = m_head, 8

    names = sorted(named_ws)
    ws = [named_ws[k] for k in names]
    idx = {k: i for i, k in enumerate(names)}

    scratch = [
        pltpu.VMEM((2, n_in + 8, 128), dtype),    # in_buf
        pltpu.SemaphoreType.DMA((2,)),            # sem
    ]
    s_pos, w_pos, e_pos, u_pos = {}, {}, {}, {}
    for l in range(depth):
        s_pos[l] = len(scratch)
        lv = lvls[l]
        shp = (3, lv.flat, lv.cout) if _staged(lv) else (lv.flat, lv.cout)
        scratch.append(pltpu.VMEM(shp, dtype))
    for l in range(depth + 1):
        if _staged(lvls[l]):
            w_pos[l] = len(scratch)
            scratch.append(pltpu.VMEM((3, lvls[l].flat, lvls[l].cout),
                                      dtype))
    # dedicated plane refs for the pooled embeddings (into level l) and the
    # decoder upsamples (at level l): 3-shifted when the consuming conv
    # runs grouped im2col, single-copy otherwise. Separate from w_refs so
    # halo rings stay zero from the t==0 memset (the conv1-intermediate
    # staging would otherwise leave stale rows under them), and filled
    # piece-by-piece (never by storing a sliced concat — see _assemble).
    for l in range(1, depth + 1):
        e_pos[l] = len(scratch)
        shp = ((3, lvls[l].flat, lvls[l].cin)
               if _group(lvls[l].cin) > 1 else (lvls[l].flat, lvls[l].cin))
        scratch.append(pltpu.VMEM(shp, dtype))
    for l in range(depth):
        u_pos[l] = len(scratch)
        shp = ((3, lvls[l].flat, lvls[l].cout)
               if _group(lvls[l].cout) > 1 else (lvls[l].flat, lvls[l].cout))
        scratch.append(pltpu.VMEM(shp, dtype))

    def kernel(x_hbm, *refs):
        w = {kk: refs[i] for kk, i in idx.items()}
        out_ref = refs[len(names)]
        scr = refs[len(names) + 1:]

        def emit(v):
            # dbg planes are lane-padded (or truncated: wide stages emit
            # their first 128 channels — lane slices must be 128-aligned)
            r, c = v.shape
            v = v.astype(jnp.float32)
            if c < 128:
                v = jnp.concatenate(
                    [v, jnp.zeros((r, 128 - c), jnp.float32)], axis=1)
            elif c > 128:
                v = v[:, :128]
            out_ref[0] = v
        in_buf, sem = scr[0], scr[1]
        s_refs = {l: scr[p] for l, p in s_pos.items()}
        w_refs = {l: scr[p] for l, p in w_pos.items()}
        e_refs = {l: scr[p] for l, p in e_pos.items()}
        u_refs = {l: scr[p] for l, p in u_pos.items()}

        def plane_src(ref):
            return ("ref3", ref) if len(ref.shape) == 3 else ("ref", ref)

        t = pl.program_id(0)
        nb = pl.num_programs(0)

        def dma(slot, tt):
            return pltpu.make_async_copy(
                x_hbm.at[tt], in_buf.at[slot], sem.at[slot])

        slot = lax.rem(t, 2)

        @pl.when(t == 0)
        def _():
            dma(0, t).start()
            for refs_ in (s_refs, w_refs, e_refs, u_refs):
                for rr in refs_.values():
                    rr[...] = jnp.zeros(rr.shape, dtype)

        t1 = t + 1

        @pl.when(t1 < nb)
        def _():
            dma(lax.rem(t1, 2), t1).start()

        dma(slot, t).wait()

        # ---------------- encoder ----------------
        for l in range(depth):
            lvl = lvls[l]
            if l == 0:
                src1 = ("slot", in_buf, slot)
            else:
                src1 = plane_src(e_refs[l])
            if dbg == f"c{l}":
                if l == 0:
                    # the slot window's unaligned tap loads cannot concat
                    # (the same Mosaic rule that forces g1=1 below)
                    raise ValueError("c0 is not bisectable: level 0 reads "
                                     "the DMA slot per-tap")
                load = _make_load(src1)
                return emit(jnp.concatenate(
                    [load(a * lvl.period, bb, lvl.m_mid)
                     for a in range(3) for bb in range(3)], axis=1))
            body = _double_conv(
                lvl, [(src1, w[f"e{l}_w1"])], w[f"e{l}_s1"], w[f"e{l}_b1"],
                w[f"e{l}_w2"], w[f"e{l}_s2"], w[f"e{l}_b2"],
                w_refs.get(l), dtype,
                emit_mid=(emit if dbg == f"i{l}" else None))
            if dbg == f"i{l}":
                return
            if dbg == f"e{l}":
                return emit(body)
            if _staged(lvl):
                for bsh in range(3):
                    s_refs[l][bsh, pl.ds(2 * lvl.period + 2 - bsh,
                                         lvl.m_body)] = body
            else:
                s_refs[l][pl.ds(2 * lvl.period + 2, lvl.m_body)] = body
            nxt = lvls[l + 1]
            pieces = _pool(body, lvl, nxt, w[f"p{l}"],
                           _kdiv(nxt.lead), dtype)
            if dbg == f"m{l}":
                return emit(_assemble(pieces, nxt, dtype))
            er = e_refs[l + 1]
            _store_pieces(er, pieces, len(er.shape) == 3)
            for sh, kk in enumerate("syz"):
                if dbg == f"{kk}{l}":
                    src = (er[sh, pl.ds(0, nxt.flat - 8)]
                           if len(er.shape) == 3
                           else er[pl.ds(0, nxt.flat - 8)])
                    return emit(src)

        # ---------------- bottleneck ----------------
        lvl = lvls[depth]
        src1 = plane_src(e_refs[depth])
        body = _double_conv(
            lvl, [(src1, w["bot_w1"])], w["bot_s1"], w["bot_b1"],
            w["bot_w2"], w["bot_s2"], w["bot_b2"], w_refs.get(depth), dtype,
            emit_mid=(emit if dbg == f"i{depth}" else None))
        if dbg == f"i{depth}":
            return
        if dbg == "b":
            return emit(body)

        # ---------------- decoder ----------------
        for u in range(depth):
            l = depth - 1 - u
            tgt, prv = lvls[l], lvls[l + 1]
            dlvl = _mk_geom(tgt.lead, tgt.sub, tgt.cout, tgt.cout, tgt.cout)
            up_pieces = _upsample(body, prv, tgt, w[f"d{l}_kt"],
                                  w[f"d{l}_ctb"], w[f"d{l}_e0"],
                                  w[f"d{l}_e1"], _kdiv(prv.lead), dtype)
            if dbg == f"u{l}":
                return emit(_assemble(up_pieces, tgt, dtype))
            ur = u_refs[l]
            _store_pieces(ur, up_pieces, len(ur.shape) == 3)
            up_src = plane_src(ur)
            skip_src = plane_src(s_refs[l])
            body = _double_conv(
                dlvl, [(skip_src, w[f"d{l}_w1s"]), (up_src, w[f"d{l}_w1u"])],
                w[f"d{l}_s1"], w[f"d{l}_b1"], w[f"d{l}_w2"], w[f"d{l}_s2"],
                w[f"d{l}_b2"], w_refs.get(l), dtype,
                want_f32=(l == 0),
                emit_mid=(emit if dbg == f"j{l}" else None))
            if dbg == f"j{l}":
                return
            if dbg == f"d{l}":
                return emit(body)

        # ---------------- head ----------------
        logits = (jnp.dot(body[0:m_head], w["head_w"][...],
                          preferred_element_type=jnp.float32)
                  + w["head_b"][:].astype(jnp.float32))
        out_ref[0] = logits

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for kk in names:
        shp = named_ws[kk].shape
        in_specs.append(pl.BlockSpec(
            shp, (lambda *_, _n=len(shp): (0,) * _n),
            memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, m_out, c_out), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_out, c_out), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the default scoped-vmem (kernel stack) limit is 16 MB; the
            # megakernel's live values need most of the chip's 128 MB
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(x_emb, *ws)
    return out


# --------------------------------------------------------------------------
# host-side operand preparation
# --------------------------------------------------------------------------

def _fold_bn(block_p, block_s, j):
    from plumekit.models.pallas.fused_conv import fold_batchnorm

    bn_p = block_p[f"_Norm_{j}"]["BatchNorm_0"]
    bn_s = block_s[f"_Norm_{j}"]["BatchNorm_0"]
    return fold_batchnorm(bn_p["scale"], bn_p["bias"], bn_s["mean"],
                          bn_s["var"])


def _pack_conv(w, dtype, g: int | None = None):
    """Arrange a (3,3,Cin,Cout) HWIO kernel for its im2col group size; tap
    (a, b) = (row, col) shift indexes weight [a, b]. ``g`` overrides the
    group (the slot-fed first conv stays per-tap)."""
    ci, co = w.shape[2], w.shape[3]
    w9 = w.reshape(9, ci, co).astype(dtype)
    g = _group(ci) if g is None else g
    if g == 9:
        return w9.reshape(1, 9 * ci, co)
    return w9


def _blockdiag_np(k, rows, cols, pairs):
    m = np.zeros((k * rows, k * cols), np.float32)
    for kk in range(k):
        for r, c in pairs:
            m[kk * rows + r, kk * cols + c] = 1.0
    return m


def make_mega_apply(cfg, dbg: str | None = None,
                    interpret: bool | None = None):
    """Returns ``apply(variables, x) -> logits`` replaying the flax UNet's
    inference semantics (batch-norm variant) through the megakernel.
    Mirrors :func:`plumekit.models.fused_forward.make_fused_apply`.
    ``dbg`` selects an intermediate-plane output (see ``mega_forward``)."""
    if cfg.norm != "batch":
        raise ValueError("megakernel forward requires the batch-norm U-Net")
    depth = cfg.depth
    from plumekit.models.unet import _dtype_of

    dtype = _dtype_of(cfg.compute_dtype)

    def apply(variables, x, train: bool = False):
        if train:
            raise ValueError("megakernel forward is inference-only")
        params = variables["params"]
        stats = variables["batch_stats"]
        interp = (jax.default_backend() in ("cpu", "gpu")
                  if interpret is None else interpret)

        b, h, wd, cin = x.shape
        if cin != cfg.in_channels:
            raise ValueError(
                f"input has {cin} channels but the config declares "
                f"{cfg.in_channels}; the megakernel packs weights from the "
                "config, so a mismatch cannot fall through to XLA silently")
        if not mega_eligible(cfg, h, wd):
            raise ValueError(
                f"megakernel ineligible for shape {(h, wd)} / config "
                "(see mega_eligible); use the XLA forward")
        lvls = _levels(h, wd, depth, 128, cfg.base_features)
        ws = {}

        # encoder + bottleneck double convs
        for l in range(depth + 1):
            blk = f"DoubleConv_{l}"
            tag = f"e{l}" if l < depth else "bot"
            w1 = params[blk]["Conv_0"]["kernel"]
            if l == 0:                      # pad input channels to 8 lanes
                w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, 128 - cin), (0, 0)))
            s1, b1 = _fold_bn(params[blk], stats[blk], 0)
            s2, b2 = _fold_bn(params[blk], stats[blk], 1)
            ws[f"{tag}_w1"] = _pack_conv(w1, dtype, g=1 if l == 0 else None)
            ws[f"{tag}_w2"] = _pack_conv(params[blk]["Conv_1"]["kernel"],
                                         dtype)
            cm, co = lvls[l].cmid, lvls[l].cout
            ws[f"{tag}_s1"] = s1.reshape(1, cm).astype(dtype)
            ws[f"{tag}_b1"] = b1.reshape(1, cm).astype(dtype)
            ws[f"{tag}_s2"] = s2.reshape(1, co).astype(dtype)
            ws[f"{tag}_b2"] = b2.reshape(1, co).astype(dtype)

        # pool selection matrices (block-diagonal, K row batches)
        for l in range(depth):
            lvl, nxt = lvls[l], lvls[l + 1]
            k = _kdiv(nxt.lead)
            ws[f"p{l}"] = jnp.asarray(_blockdiag_np(
                k, nxt.period, lvl.period,
                [(j + 2, 2 * j) for j in range(nxt.sub)]), dtype)

        # decoder
        for u in range(depth):
            l = depth - 1 - u
            tgt, prv = lvls[l], lvls[l + 1]
            kt = params[f"ConvTranspose_{u}"]["kernel"]   # (2,2,Cin,Cout)
            ctb = params[f"ConvTranspose_{u}"]["bias"]
            # flax conv_transpose applies the kernel flipped:
            # out[2u+du, 2v+dv] = x[u, v] @ k[1-du, 1-dv]
            ws[f"d{l}_kt"] = jnp.stack(
                [kt[1 - du, 1 - dv] for du in (0, 1) for dv in (0, 1)]
            ).astype(dtype)
            ws[f"d{l}_ctb"] = ctb.reshape(1, tgt.cout).astype(dtype)
            k = _kdiv(prv.lead)
            for dv in (0, 1):
                ws[f"d{l}_e{dv}"] = jnp.asarray(_blockdiag_np(
                    k, tgt.period, prv.period,
                    [(2 * v + dv + 2, v) for v in range(prv.sub)]), dtype)

            blk = f"DoubleConv_{depth + 1 + u}"
            w1 = params[blk]["Conv_0"]["kernel"]          # (3,3,2C,C)
            c = tgt.cout
            s1, b1 = _fold_bn(params[blk], stats[blk], 0)
            s2, b2 = _fold_bn(params[blk], stats[blk], 1)
            ws[f"d{l}_w1s"] = _pack_conv(w1[:, :, :c, :], dtype)
            ws[f"d{l}_w1u"] = _pack_conv(w1[:, :, c:, :], dtype)
            ws[f"d{l}_w2"] = _pack_conv(params[blk]["Conv_1"]["kernel"],
                                        dtype)
            ws[f"d{l}_s1"] = s1.reshape(1, c).astype(dtype)
            ws[f"d{l}_b1"] = b1.reshape(1, c).astype(dtype)
            ws[f"d{l}_s2"] = s2.reshape(1, c).astype(dtype)
            ws[f"d{l}_b2"] = b2.reshape(1, c).astype(dtype)

        # head (1×1 conv, fp32)
        head = params["head"]
        hw = head["kernel"][0, 0].astype(jnp.float32)     # (C0, out)
        out_ch = hw.shape[1]
        ws["head_w"] = jnp.pad(hw, ((0, 0), (0, 8 - out_ch)))
        ws["head_b"] = jnp.pad(head["bias"].astype(jnp.float32),
                               (0, 8 - out_ch)).reshape(1, 8)

        # embed the input: pixel (r, j) -> flat (r+2)·period0 + (j+2)
        lv0 = lvls[0]
        n_in = 2 * lv0.period + lv0.m_mid
        xp = jnp.pad(x.astype(dtype),
                     ((0, 0), (2, 7), (2, lv0.period - wd - 2),
                      (0, 128 - cin)))
        x_emb = xp.reshape(b, (h + 9) * lv0.period, 128)[:, :n_in + 8]

        out = mega_forward(x_emb, ws, lvls, depth, dtype, interp,
                           dbg=dbg)
        if dbg is not None:
            return out
        # conv bodies carry pixel (r, j) at flat r·period + j
        out = out.reshape(b, h, lv0.period, 8)
        return out[:, :, :wd, :out_ch]

    return apply


def mega_eligible(cfg, h: int, w: int) -> bool:
    """True when the megakernel supports this config/shape: batch-norm
    UNet in bf16/fp32, ≤128 input channels, spatial dims divisible by
    2**depth with a ≥2-px bottleneck, and a tile small enough for the
    kernel's live values to fit v5e VMEM. The VMEM gate is the empirical
    v5e scaling law ≈ 280 B per (row·period·base-feature) — calibrated by
    the 32-base OOM at 128² (155 MB used) vs the compiling 96²; ineligible
    shapes fall through to the XLA forward instead of failing to compile."""
    d = cfg.depth
    period0 = ((w + 4 + 7) // 8) * 8
    vmem_est = 280 * h * period0 * cfg.base_features
    return (cfg.norm == "batch"
            and getattr(cfg, "arch", "unet") == "unet"
            and d >= 1        # depth-0 has no encoder ring for the
                              # bottleneck feed; fall through to XLA
            and cfg.compute_dtype in ("bfloat16", "float32")
            and cfg.in_channels <= 128
            and h % (1 << d) == 0 and w % (1 << d) == 0
            and (h >> d) >= 2 and (w >> d) >= 2
            and cfg.out_channels <= 8
            and vmem_est <= 120 * 1024 * 1024)
