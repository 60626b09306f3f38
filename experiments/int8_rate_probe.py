#!/usr/bin/env python
"""Attribute the round-3 int8 serving slowdown (126.8 vs 230.5 MPix/s).

The v5e MXU is documented at 2x int8 vs bf16, yet the s8xs8->s32 U-Net
forward measured ~0.55x the bf16 path end-to-end. This probes the raw
primitive rates under the platform timing discipline (chained repeats in
one jit, scalar readback): if a bare s8 conv/matmul already runs at or
below the bf16 rate, the loss is XLA's int8 lowering on this stack, not
plumekit's quantized-forward design; if the primitives ARE ~2x, the loss
is our quantize/dequant epilogues and the design needs work.

Usage: python experiments/int8_rate_probe.py [--cpu]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--repeats", type=int, default=8)
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

R = args.repeats
print(f"backend: {jax.default_backend()}  repeats: {R}")


def chain_time(label, flops, init, step):
    """step(x) -> x' of the same dtype/shape; R reps chained in one jit."""

    def repeated(x):
        return lax.fori_loop(0, R, lambda _i, v: step(v), x)

    rep = jax.jit(repeated)
    out = rep(init)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # sync (relay: scalar readback)
    t0 = time.perf_counter()
    out = rep(init)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:44s} {dt*1e3:8.2f} ms  {flops / dt / 1e12:7.2f} TFLOPS")
    return dt


# ---- matmul: 4096^3 ---------------------------------------------------
N = 4096
mm_flops = 2 * N**3

kb = jnp.asarray(np.random.randn(N, N) * 0.05, jnp.bfloat16)


def mm_bf16(x):
    return jnp.dot(x, kb, preferred_element_type=jnp.bfloat16)


chain_time("matmul 4096^3 bf16", mm_flops,
           jnp.asarray(np.random.randn(N, N) * 0.05, jnp.bfloat16), mm_bf16)

ki = jnp.asarray(np.random.randint(-127, 128, (N, N)), jnp.int8)


def mm_int8(x):
    acc = jnp.dot(x, ki, preferred_element_type=jnp.int32)
    # cheap requant to keep the chain int8 without leaving the device
    return (acc >> 8).astype(jnp.int8)


chain_time("matmul 4096^3 s8xs8->s32 (+>>8 requant)", mm_flops,
           jnp.asarray(np.random.randint(-127, 128, (N, N)), jnp.int8),
           mm_int8)

# ---- conv: the U-Net hot shape (batch of tiles, 3x3, wide channels) ----
B, H, W, C = 64, 72, 72, 256  # one deep U-Net level's tile batch
conv_flops = 2 * B * H * W * 9 * C * C
dn = lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                ("NHWC", "HWIO", "NHWC"))

wb = jnp.asarray(np.random.randn(3, 3, C, C) * 0.02, jnp.bfloat16)


def conv_bf16(x):
    return lax.conv_general_dilated(x, wb, (1, 1), "SAME",
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.bfloat16)


chain_time(f"conv3x3 {B}x{H}x{W}x{C} bf16", conv_flops,
           jnp.asarray(np.random.randn(B, H, W, C) * 0.05, jnp.bfloat16),
           conv_bf16)

wi = jnp.asarray(np.random.randint(-127, 128, (3, 3, C, C)), jnp.int8)


def conv_int8(x):
    acc = lax.conv_general_dilated(x, wi, (1, 1), "SAME",
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.int32)
    return (acc >> 10).astype(jnp.int8)


chain_time(f"conv3x3 {B}x{H}x{W}x{C} s8xs8->s32 (+requant)", conv_flops,
           jnp.asarray(np.random.randint(-127, 128, (B, H, W, C)), jnp.int8),
           conv_int8)
