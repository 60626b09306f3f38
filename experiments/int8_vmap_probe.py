#!/usr/bin/env python
"""Distinguish WHY vmap pessimizes the int8 apply 2.6x (int8_apply_probe:
flat 64x288^2 int8 19.9 ms beats bf16 31.3, but vmap G=4 int8 runs
129.6 ms vs bf16 70.0 — the exact structure make_multi_granule_infer
executes).

Hypotheses:
  (a) size/HBM — 4x the tiles pushes fp32 requant intermediates past a
      fusion/HBM threshold: test with a FLAT G*B batch (no vmap);
  (b) vmap batching rules — some primitive (the upsample einsum, int8
      concat, requant) batches badly: test the same G*B work expressed
      as vmap, and a jax.custom_batching.custom_vmap wrapper that folds
      the mapped axis into the batch dim (the fix candidate if (b)).

Usage: python experiments/int8_vmap_probe.py [--cpu] [--g 4]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--batch", type=int, default=64)
p.add_argument("--tile", type=int, default=288)
p.add_argument("--g", type=int, default=4)
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

from plumekit.config.train import TrainConfig, UNetConfig
from plumekit.models import UNet
from plumekit.models.quantized_forward import (make_quantized_apply,
                                               quantize_unet)
from plumekit.train.state import create_state

R, B, T, G = args.repeats, args.batch, args.tile, args.g
print(f"backend: {jax.default_backend()}  G={G} x {B}x{T}^2  repeats: {R}")

cfg = UNetConfig()
state = create_state(jax.random.PRNGKey(0), cfg, TrainConfig(tile_size=T))
variables = {"params": state.params}
if state.batch_stats is not None:
    variables["batch_stats"] = state.batch_stats

rng = np.random.default_rng(0)
calib = jnp.asarray(rng.random((4, T, T, cfg.in_channels), np.float32))
qvars = quantize_unet(variables, cfg, calib)
qapply = make_quantized_apply(cfg)
model = UNet(cfg)

xg = jnp.asarray(rng.random((G, B, T, T, cfg.in_channels), np.float32))
gmpix = G * B * T * T / 1e6


def chain_time(label, fn):
    """fn(x (G,B,T,T,C)) -> scalar-reducible output."""

    def repeated(x0):
        def body(_i, acc):
            y = fn(x0 + acc * 1e-12)
            return jnp.float32(y.mean())

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    out = rep(xg)
    jax.block_until_ready(out)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(rep(xg))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:52s} {dt*1e3:8.2f} ms  {gmpix/dt:8.1f} MPix/s")
    return dt


# (a) flat G*B batch — same work, no vmap
chain_time("int8 FLAT (G*B batch, reshape in caller)",
           lambda x: qapply(qvars, x.reshape(G * B, T, T, -1)))
chain_time("bf16 FLAT (G*B batch)",
           lambda x: model.apply(variables, x.reshape(G * B, T, T, -1),
                                 train=False))

# (b) vmap — the make_multi_granule_infer structure
chain_time("int8 vmap",
           lambda x: jax.vmap(lambda t: qapply(qvars, t))(x))
chain_time("bf16 vmap",
           lambda x: jax.vmap(
               lambda t: model.apply(variables, t, train=False))(x))

# fix candidate: custom_vmap that folds the mapped axis into batch
from jax.custom_batching import custom_vmap


@custom_vmap
def qapply_cv(x):
    return qapply(qvars, x)


@qapply_cv.def_vmap
def _qapply_batch_rule(axis_size, in_batched, x):
    (xb,) = in_batched
    if not xb:
        return qapply_cv(x), False
    lead = x.shape[0]
    y = qapply(qvars, x.reshape((lead * x.shape[1],) + x.shape[2:]))
    return y.reshape((lead, x.shape[1]) + y.shape[1:]), True


chain_time("int8 custom_vmap (fold into batch)",
           lambda x: jax.vmap(qapply_cv)(x))
