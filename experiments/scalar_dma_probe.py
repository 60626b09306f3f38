#!/usr/bin/env python
"""Micro-probe: can Mosaic do per-element dynamic-offset DMAs (the sparse
pointer-jump primitive for the CCL kernel)?

Kernel: for each of N 'representative' positions (static grid), read the
int32 at that position via a (1,1) VMEM->SMEM DMA, treat the VALUE as a
flat pixel id, dereference it with a second (1,1) DMA, and write the
result back with a (1,1) SMEM->VMEM DMA. Checks exact semantics against
numpy and times R chained reps to get per-lookup cost.

Usage: python experiments/scalar_dma_probe.py [--cpu]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time
from functools import partial

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--size", type=int, default=1024)
p.add_argument("--reps", type=int, default=1024, help="lookup count")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from plumekit.utils.backend import probe_backend

    probe_backend()
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = args.size
N = args.reps
STRIDE_R = max(1, H // 32)
STRIDE_C = max(1, W // (N // 32))


def kernel(x_ref, out_ref, buf, sem):
    # copy input through (identity) first
    out_ref[...] = x_ref[...]

    def one(i, _):
        r = (i // (N // 32)) * STRIDE_R
        c = (i % (N // 32)) * STRIDE_C
        # hop 1: read x[r, c]
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(r, 1), pl.ds(c, 1)], buf.at[pl.ds(0, 1)], sem)
        cp.start()
        cp.wait()
        v = buf[0, 0]
        vr = v // W
        vc = v % W
        # hop 2: read x[vr, vc] (dereference the VALUE as a position)
        cp2 = pltpu.make_async_copy(
            x_ref.at[pl.ds(vr, 1), pl.ds(vc, 1)], buf.at[pl.ds(0, 1)], sem)
        cp2.start()
        cp2.wait()
        # write back to (r, c)
        cp3 = pltpu.make_async_copy(
            buf.at[pl.ds(0, 1)], out_ref.at[pl.ds(r, 1), pl.ds(c, 1)], sem)
        cp3.start()
        cp3.wait()
        return 0

    lax.fori_loop(0, N, one, 0)


@partial(jax.jit, static_argnames=("interpret",))
def run(x, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((H, W), lambda: (0, 0))],
        out_specs=pl.BlockSpec((H, W), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(x)


rng = np.random.default_rng(0)
x = rng.integers(0, H * W, (H, W)).astype(np.int32)
expected = x.copy()
for i in range(N):
    r = (i // (N // 32)) * STRIDE_R
    c = (i % (N // 32)) * STRIDE_C
    v = x[r, c]
    expected[r, c] = x[v // W, v % W]

print(f"backend: {jax.default_backend()}  size {H}x{W}  lookups {N}")
t0 = time.perf_counter()
got = np.asarray(run(jnp.asarray(x)))
print(f"compile+run {time.perf_counter()-t0:.1f} s")
ok = (got == expected).all()
print("exact:", ok)
if not ok:
    bad = np.argwhere(got != expected)
    print("mismatches:", len(bad), "first:", bad[:5])
    raise SystemExit(1)

# timing: chain K kernel invocations (each N lookups)
def chained(x):
    def body(_i, acc):
        y = run(x + (acc * 0).astype(jnp.int32))
        return y[0, 0] + acc * 0

    return lax.fori_loop(0, 5, body, jnp.int32(0))


cj = jax.jit(chained)
_ = int(cj(jnp.asarray(x)))
t0 = time.perf_counter()
_ = int(cj(jnp.asarray(x)))
dt = (time.perf_counter() - t0) / 5
print(f"per kernel: {dt*1e3:.2f} ms  per lookup: {dt/N*1e6:.2f} us")
