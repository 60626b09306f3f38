#!/usr/bin/env python
"""Localize the int8 serving slowdown per U-Net level.

int8_rate_probe.py showed the s8 conv primitive is 1.37x bf16 at the
deep-level shape (C=256), yet the end-to-end int8 forward runs at 0.55x
the bf16 path. The U-Net's levels have ~equal FLOPs (H halves, C
doubles) but the quant/requant ELEMENTWISE traffic scales as H^2*C —
32x more bytes at level 0 (288^2*32) than level 3 (36^2*256). This
times one DoubleConv block (+ output requant, the serving hot path's
repeating unit) per level in both formulations to see where the loss
lives.

Usage: python experiments/int8_block_probe.py [--cpu] [--batch 64]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--batch", type=int, default=64)
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
B = args.batch
print(f"backend: {jax.default_backend()}  batch: {B}  repeats: {R}")

_DN = ("NHWC", "HWIO", "NHWC")


def chain_time(label, flops, init, step):
    def repeated(x):
        return lax.fori_loop(0, R, lambda _i, v: step(v), x)

    rep = jax.jit(repeated)
    out = rep(init)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = rep(init)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:40s} {dt*1e3:8.2f} ms  {flops / dt / 1e12:7.2f} TFLOPS")
    return dt


rng = np.random.default_rng(0)

# bench config: base 32, depth 4, 288^2 tiles. Encoder level i sees
# (288/2^i)^2 spatial at cin -> cout channels (cin=2 at the stem).
levels = [(288, 2, 32), (144, 32, 64), (72, 64, 128), (36, 128, 256),
          (18, 256, 512)]

for H, cin, cout in levels:
    flops = 2 * B * H * H * 9 * (cin * cout + cout * cout)

    # ---- bf16 double conv (conv+BN+ReLU x2), the flax path's unit ----
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cout, cout)) * 0.05,
                     jnp.bfloat16)
    a = jnp.asarray(rng.random((cout,)) + 0.5, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.bfloat16)

    def bf16_block(x, w1=w1, w2=w2, a=a, b=b, cin=cin):
        y = lax.conv_general_dilated(x, w1, (1, 1), "SAME",
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.bfloat16)
        y = jnp.maximum(y * a + b, 0)
        y = lax.conv_general_dilated(y, w2, (1, 1), "SAME",
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.bfloat16)
        y = jnp.maximum(y * a + b, 0)
        # keep the chain shape-stable: fold back to cin channels
        return y[..., :cin] * jnp.bfloat16(1e-3)

    chain_time(f"L{H:3d} {cin:3d}->{cout:3d} bf16 block", flops,
               jnp.asarray(rng.random((B, H, H, cin)), jnp.bfloat16),
               bf16_block)

    # ---- int8 double conv: qconv -> fp32 epilogue -> requant x2 ------
    wq1 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
    wq2 = jnp.asarray(rng.integers(-127, 128, (3, 3, cout, cout)), jnp.int8)
    af = jnp.asarray(rng.random((cout,)) * 1e-4 + 1e-5, jnp.float32)
    bf = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)

    def q_block(xq, wq1=wq1, wq2=wq2, af=af, bf=bf, cin=cin):
        y = lax.conv_general_dilated(xq, wq1, (1, 1), "SAME",
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.int32)
        y = jnp.maximum(y.astype(jnp.float32) * af + bf, 0.0)
        mq = jnp.clip(jnp.round(y / 0.02), -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(mq, wq2, (1, 1), "SAME",
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.int32)
        y = jnp.maximum(y.astype(jnp.float32) * af + bf, 0.0)
        oq = jnp.clip(jnp.round(y / 0.02), -127, 127).astype(jnp.int8)
        return oq[..., :cin]

    chain_time(f"L{H:3d} {cin:3d}->{cout:3d} int8 block", flops,
               jnp.asarray(rng.integers(-127, 128, (B, H, H, cin)),
                           jnp.int8),
               q_block)

# ---- the transposed-conv upsample formulations at the first decoder hop
H, cin, cout = 18, 512, 256
up_flops = 2 * B * H * H * 4 * cin * cout

kq = jnp.asarray(rng.integers(-127, 128, (2, 2, cin, cout)), jnp.int8)
sw = jnp.asarray(rng.random((cout,)) * 1e-4, jnp.float32)
bias = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)


def up_einsum_chain(xq):
    # the shipped _upsample_q formulation: int8 einsum + pixel shuffle
    acc = jnp.einsum("bhwc,ijco->bhwijo", xq, kq,
                     preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sw + bias
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * H, cout)
    oq = jnp.clip(jnp.round(y / 0.02), -127, 127).astype(jnp.int8)
    # fold back to the input shape/channels to chain the repeats
    return jnp.concatenate([oq[:, ::2, ::2, :], oq[:, 1::2, ::2, :]],
                           axis=-1)


chain_time(f"up {H}^2 {cin}->{cout} int8 einsum", up_flops,
           jnp.asarray(rng.integers(-127, 128, (B, H, H, cin)), jnp.int8),
           up_einsum_chain)

kb = jnp.asarray(rng.standard_normal((2, 2, cout, cin)) * 0.05,
                 jnp.bfloat16)


def up_bf16(x):
    y = lax.conv_transpose(x, kb.transpose(0, 1, 3, 2), (2, 2), "VALID",
                           dimension_numbers=_DN,
                           preferred_element_type=jnp.bfloat16)
    return jnp.concatenate([y[:, ::2, ::2, :], y[:, 1::2, ::2, :]],
                           axis=-1)


chain_time(f"up {H}^2 {cin}->{cout} bf16 conv_transpose", up_flops,
           jnp.asarray(rng.random((B, H, H, cin)), jnp.bfloat16),
           up_bf16)
