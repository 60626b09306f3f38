#!/usr/bin/env python
"""Time the REAL forwards head-to-head on one 64x288^2 tile batch.

int8_block_probe.py showed every synthetic int8 DoubleConv level at or
above the bf16 rate (encoder sum 25.0 vs 30.7 ms), yet the end-to-end
int8 bench ran 0.55x bf16. This times the actual apply functions the
bench uses — flax UNet.apply (bf16) vs make_quantized_apply — on the
bench's tile-batch unit, plus an int8 variant with the fp32 tail
(last decoder block + head) ablated, to localize the remaining sink.

Usage: python experiments/int8_apply_probe.py [--cpu]
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

R, B, T = args.repeats, args.batch, args.tile
print(f"backend: {jax.default_backend()}  batch: {B}x{T}^2  repeats: {R}")

cfg = UNetConfig()  # bench config: base 32, depth 4, bf16
state = create_state(jax.random.PRNGKey(0), cfg, TrainConfig(tile_size=T))
variables = {"params": state.params}
if state.batch_stats is not None:
    variables["batch_stats"] = state.batch_stats

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, T, T, cfg.in_channels), np.float32))
mpix = B * T * T / 1e6


def chain_time(label, fn, vs):
    def repeated(vs, x0):
        def body(_i, acc):
            y = fn(vs, x0 + acc * 1e-12)
            return jnp.float32(y.mean())

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    out = rep(vs, x)
    jax.block_until_ready(out)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(rep(vs, x))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:44s} {dt*1e3:8.2f} ms  {mpix/dt:8.1f} MPix/s")
    return dt


model = UNet(cfg)
chain_time("flax UNet.apply bf16", lambda v, t: model.apply(
    v, t, train=False), variables)

calib = jnp.asarray(rng.random((4, T, T, cfg.in_channels), np.float32))
qvars = quantize_unet(variables, cfg, calib)
qapply = make_quantized_apply(cfg)
chain_time("quantized apply int8", qapply, qvars)

# ---- ablation: quantize the final decoder output too, head on int8 ----
import plumekit.models.quantized_forward as qf

last = qvars["blocks"][-1]
if last["s_out"] is None:
    import copy

    qv2 = dict(qvars)
    qv2["blocks"] = list(qvars["blocks"])
    lb = dict(last)
    lb["s_out"] = jnp.float32(0.02)
    qv2["blocks"][-1] = lb

    def qapply_i8tail(qvars, x):
        depth = cfg.depth
        xq = qf._quant_act(x.astype(jnp.float32), qvars["s_in"])
        skips = []
        for i in range(depth):
            blk = qvars["blocks"][i]
            y = qf._qblock(xq, blk)
            oq = qf._quant_act(y, blk["s_out"])
            skips.append(oq)
            xq = qf._max_pool2_q(oq)
        blk = qvars["blocks"][depth]
        y = qf._qblock(xq, blk)
        xq = qf._quant_act(y, blk["s_out"])
        for u, skip in enumerate(reversed(skips)):
            up = qvars["ups"][u]
            y = qf._upsample_q(xq, up["kq"], up["sw"], up["bias"])
            uq = qf._quant_act(y, up["s_up"])
            blk = qvars["blocks"][depth + 1 + u]
            y = qf._qblock(jnp.concatenate([skip, uq], axis=-1), blk)
            xq = qf._quant_act(y, blk["s_out"])
        head = qvars["head"]
        logits = (jnp.einsum("bhwc,co->bhwo",
                             xq.astype(jnp.float32) * 0.02,
                             head["kernel"][0, 0]) + head["bias"])
        return logits

    chain_time("quantized apply, int8 tail (ablation)", qapply_i8tail, qv2)


# ---- the multi-granule inner unit: vmap over G granules ---------------
G = int(_os.environ.get("PROBE_G", "4"))
xg = jnp.asarray(rng.random((G, B, T, T, cfg.in_channels), np.float32))
gmpix = G * B * T * T / 1e6


def chain_time_g(label, fn, vs):
    vfn = jax.vmap(fn, in_axes=(None, 0))

    def repeated(vs, x0):
        def body(_i, acc):
            y = vfn(vs, x0 + acc * 1e-12)
            return jnp.float32(y.mean())

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    out = rep(vs, xg)
    jax.block_until_ready(out)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(rep(vs, xg))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:44s} {dt*1e3:8.2f} ms  {gmpix/dt:8.1f} MPix/s")
    return dt


if _os.environ.get("PROBE_VMAP", "1") == "1":
    chain_time_g(f"vmap G={G} flax UNet.apply bf16",
                 lambda v, t: model.apply(v, t, train=False), variables)
    chain_time_g(f"vmap G={G} quantized apply int8", qapply, qvars)
