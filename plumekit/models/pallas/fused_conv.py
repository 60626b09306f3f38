"""Fused 3×3 conv + folded-BatchNorm + ReLU as a Pallas TPU kernel.

BASELINE.json's north star calls for the U-Net's double-conv blocks "lowered
to fused Pallas conv+BN+ReLU kernels in bf16". The kernel beats XLA's conv
by ~2× at the U-Net's deep levels (measured on v5e: 25-26 TFLOPS vs 12.4
for ``lax.conv`` at C∈{128,256,512}).

Mosaic-friendly design (found by construction against the v5e compiler —
lane slices must be 128-aligned, shifted-view concats and sliced-view
reshapes don't lower):

* the image is pre-padded and **row-flattened** host-side to
  ``(B, (H+3)·W_pad, C)`` where ``W_pad`` is the padded row width — in this
  layout the (dy, dx) tap of a row-tile is a *contiguous sublane slice* at
  offset ``dy·W_pad + dx``;
* the grid is (batch, row-tiles); each program DMAs one contiguous slab from
  HBM and computes the whole tile as **nine MXU matmuls of shape
  (tile_rows·W_pad, Cin) @ (Cin, Cout)** accumulated in fp32 — M is always
  ≥ 1k, so the MXU stays fed even for small images;
* folded BatchNorm (:func:`fold_batchnorm`) and ReLU fuse into the epilogue;
* output keeps the flattened layout; the wrapper crops the padded columns
  back off. Columns beyond W hold wrap-around garbage by construction and
  never escape.

:func:`fused_conv3x3_bn_relu` auto-falls back to the XLA path when channels
aren't multiples of the 128-lane width (the shallow U-Net levels), so it is
safe to call at every level. ``interpret=True`` runs on CPU for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_batchnorm(gamma, beta, mean, var, eps: float = 1e-5):
    """(scale, shift) such that ``scale * x + shift`` equals inference-mode
    BatchNorm with the given parameters/statistics."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


def conv3x3_bn_relu_xla(x, w, scale, shift):
    """Oracle/fallback: SAME 3×3 conv (NHWC, HWIO) + scale/shift + ReLU."""
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(x.dtype)


def _kernel(x_hbm, w_ref, scale_ref, shift_ref, out_ref, xwin, sem,
            *, tile_rows: int, w_pad: int, cout: int, slab: int,
            n_tiles: int):
    """Grid programs run sequentially per core and scratch persists across
    steps, so slab i+1's DMA is issued before computing slab i (two-slot
    double buffering; VERDICT round-1 weak #2)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    m = tile_rows * w_pad
    g = b * n_tiles + i
    total = nb * n_tiles

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * m, slab)], xwin.at[slot], sem.at[slot]
        )

    slot = lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(0, b, i).start()

    g1 = g + 1

    @pl.when(g1 < total)
    def _():
        dma(lax.rem(g1, 2), g1 // n_tiles, lax.rem(g1, n_tiles)).start()

    dma(slot, b, i).wait()

    acc = jnp.zeros((m, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = xwin[slot, pl.ds(dy * w_pad + dx, m), :]
            acc = acc + jnp.dot(v, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    y = acc * scale_ref[:].astype(jnp.float32) + shift_ref[:].astype(jnp.float32)
    out_ref[0] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


def _double_kernel(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   out_ref, xwin, sem,
                   *, tile_rows: int, w_pad: int, cmid: int, cout: int,
                   slab: int, width: int, height: int, n_tiles: int):
    """Both taps of a double-conv block in one program: conv1+bn+relu into a
    VMEM-resident intermediate (with its own 1-px halo), then conv2+bn+relu
    to the output rows — one HBM read and one HBM write for two convs.
    Input slabs are double-buffered: slab i+1's DMA overlaps slab i's 18
    matmuls (see :func:`_kernel`)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    m_out = tile_rows * w_pad
    m_mid = (tile_rows + 2) * w_pad + 8   # slack so conv2's +2 shift stays in range
    g = b * n_tiles + i
    total = nb * n_tiles

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * m_out, slab)], xwin.at[slot],
            sem.at[slot]
        )

    slot = lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(0, b, i).start()

    g1 = g + 1

    @pl.when(g1 < total)
    def _():
        dma(lax.rem(g1, 2), g1 // n_tiles, lax.rem(g1, n_tiles)).start()

    dma(slot, b, i).wait()

    acc1 = jnp.zeros((m_mid, cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = xwin[slot, pl.ds(dy * w_pad + dx, m_mid), :]
            acc1 = acc1 + jnp.dot(v, w1_ref[dy * 3 + dx],
                                  preferred_element_type=jnp.float32)
    inter = jnp.maximum(
        acc1 * s1_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32),
        0.0,
    ).astype(xwin.dtype)

    # SAME-conv chaining semantics: the second conv must see *zeros* outside
    # the true image, but conv1 computed real values in the halo ring (from
    # the zero-padded input). Zero the ring: intermediate position q maps to
    # true col (q mod w_pad) - 1 and true row i*tile_rows + q//w_pad - 1.
    # arithmetic mask, NOT jnp.where on an (m,1) i1 vector: broadcasting a
    # boolean (n,1) against (n,C) goes through v5e Mosaic's
    # replicated-lane relayout — the construct that crashed/corrupted
    # unet_mega on-chip (CLAUDE.md Mosaic rules; fix pattern mirrors
    # unet_mega._double_conv)
    q = lax.broadcasted_iota(jnp.int32, (m_mid, 1), 0)
    col = q % w_pad - 1
    row = i * tile_rows + q // w_pad - 1
    in_img = ((col >= 0) & (col < width) & (row >= 0)
              & (row < height))
    inter = inter * in_img.astype(inter.dtype)

    acc2 = jnp.zeros((m_out, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            off = dy * w_pad + dx
            acc2 = acc2 + jnp.dot(
                inter[off : off + m_out],
                w2_ref[dy * 3 + dx],
                preferred_element_type=jnp.float32,
            )
    y = acc2 * s2_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    out_ref[0] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile_rows", "interpret", "force_pallas"))
def fused_double_conv3x3_bn_relu(x, w1, scale1, shift1, w2, scale2, shift2,
                                 tile_rows: int = 16, interpret: bool = False,
                                 force_pallas: bool = False):
    """One U-Net double-conv block — (conv3x3+BN+ReLU)×2 — as a single Pallas
    program. Falls back to two XLA taps when channels don't fill the lanes.

    x: (B, H, W, Cin); w1: (3,3,Cin,Cmid); w2: (3,3,Cmid,Cout).
    """
    b, h, wd, cin = x.shape
    cmid = w1.shape[-1]
    cout = w2.shape[-1]

    tm = tile_rows
    while tm > 1 and h % tm:
        tm //= 2
    eligible = (
        cin % 128 == 0 and cmid % 128 == 0 and cout % 128 == 0
        and tm >= 8        # awkward heights reduce tm to 1 — fall back
    )
    if not (interpret or force_pallas or eligible):
        y = conv3x3_bn_relu_xla(x, w1, scale1, shift1)
        return conv3x3_bn_relu_xla(y, w2, scale2, shift2)

    # halo 2 (two stacked 3x3 convs); right pad so W_pad is a sublane
    # multiple; bottom pad covers the slab over-read INCLUDING the +16
    # sublane slack (at w_pad=8 the last tile's DMA reads 2 rows past a
    # 3-row pad — pad ceil(16/w_pad) extra rows)
    w_pad = ((wd + 4 + 7) // 8) * 8
    slab = (tm + 4) * w_pad + 16
    extra = -(-16 // w_pad)
    xp = jnp.pad(x, ((0, 0), (2, 3 + extra), (2, w_pad - wd - 2), (0, 0)))
    xflat = xp.reshape(b, (h + 5 + extra) * w_pad, cin)

    kern = partial(_double_kernel, tile_rows=tm, w_pad=w_pad, cmid=cmid,
                   cout=cout, slab=slab, width=wd, height=h,
                   n_tiles=h // tm)
    out = pl.pallas_call(
        kern,
        grid=(b, h // tm),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cin, cmid), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cmid, cout), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tm * w_pad, cout), lambda bi, i: (bi, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * w_pad, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_pad * 9 * (cin * cmid + cmid * cout),
            bytes_accessed=(
                b * h * w_pad * (cin + cout) * x.dtype.itemsize
                + 9 * (cin * cmid + cmid * cout) * w1.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(xflat, w1.reshape(9, cin, cmid), scale1.reshape(1, cmid),
      shift1.reshape(1, cmid), w2.reshape(9, cmid, cout),
      scale2.reshape(1, cout), shift2.reshape(1, cout))
    return out.reshape(b, h, w_pad, cout)[:, :, :wd, :]


@partial(jax.jit, static_argnames=("tile_rows", "interpret", "force_pallas"))
def fused_conv3x3_bn_relu(x, w, scale, shift, tile_rows: int = 16,
                          interpret: bool = False,
                          force_pallas: bool = False):
    """Fused SAME 3×3 conv + scale/shift + ReLU.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout); scale/shift: (Cout,).
    Returns (B, H, W, Cout) in x.dtype.

    The Pallas path runs when Cin and Cout are multiples of 128 (full MXU
    lanes) and H divides by a tile size; anything else falls back to
    :func:`conv3x3_bn_relu_xla` (identical semantics) unless
    ``force_pallas``/``interpret`` demand the kernel.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]

    tm = tile_rows
    while tm > 1 and h % tm:
        tm //= 2
    eligible = (cin % 128 == 0) and (cout % 128 == 0) and tm >= 8
    if not (interpret or force_pallas or eligible):
        return conv3x3_bn_relu_xla(x, w, scale, shift)

    w_pad = ((wd + 2 + 7) // 8) * 8
    slab = (tm + 2) * w_pad + 8
    # +1 halo row top, +2 bottom (slab over-read), +1 halo col left, pad
    # right up to w_pad
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, w_pad - wd - 1), (0, 0)))
    xflat = xp.reshape(b, (h + 3) * w_pad, cin)
    w9 = w.reshape(9, cin, cout)

    kern = partial(_kernel, tile_rows=tm, w_pad=w_pad, cout=cout, slab=slab,
                   n_tiles=h // tm)
    out = pl.pallas_call(
        kern,
        grid=(b, h // tm),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM; DMA'd
            pl.BlockSpec((9, cin, cout), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tm * w_pad, cout), lambda bi, i: (bi, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * w_pad, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_pad * 9 * cin * cout,
            bytes_accessed=(
                b * h * w_pad * (cin + cout) * x.dtype.itemsize
                + 9 * cin * cout * w.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(xflat, w9, scale.reshape(1, cout), shift.reshape(1, cout))
    return out.reshape(b, h, w_pad, cout)[:, :, :wd, :]
