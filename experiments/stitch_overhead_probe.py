#!/usr/bin/env python
"""Attribute the non-forward cost of the dispatch-amortised program.

At the int8 headline config (4x8192^2, tile 256, overlap 0) the flat
forward accounts for ~518 ms of a ~734 ms program (int8_vmap_probe vs
bench) — ~30% goes to tile gather + sigmoid + canvas assembly. This
times the pipeline cumulatively, one stage at a time, all on-chip under
the chained fori_loop protocol:

  flat     forward on pre-extracted tiles (no gather, no stitch)
  +gather  vmapped dynamic_slice extraction inside the scan
  +sigmoid gather + forward + sigmoid
  full     make_multi_granule_infer (gather + forward + sigmoid +
           parity-class canvas assembly + threshold)

Usage: python experiments/stitch_overhead_probe.py [--cpu] [--bf16]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--bf16", action="store_true", help="flax bf16 forward "
               "instead of int8")
p.add_argument("--arch", default="unet",
               help="unet | unetpp[:ds[:pL]] (bench.py's ARCH syntax)")
p.add_argument("--granule", type=int, default=8192)
p.add_argument("--granules", type=int, default=4)
p.add_argument("--tile", type=int, default=256)
p.add_argument("--batch-tiles", type=int, default=64)
p.add_argument("--repeats", type=int, default=3)
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

from plumekit.config.train import InferConfig, TrainConfig, UNetConfig
from plumekit.infer.sliding import make_multi_granule_infer, tile_grid
from plumekit.models import UNet
from plumekit.train.state import create_state

S, G, T, BT, R = (args.granule, args.granules, args.tile,
                  args.batch_tiles, args.repeats)
_parts = args.arch.split(":")
cfg = UNetConfig(arch=_parts[0],
                 deep_supervision="ds" in _parts[1:],
                 prune_level=next((int(t[1:]) for t in _parts[1:]
                                   if t.startswith("p")), None))
state = create_state(jax.random.PRNGKey(0), cfg, TrainConfig(tile_size=T))
variables = {"params": state.params}
if state.batch_stats is not None:
    variables["batch_stats"] = state.batch_stats

rng = np.random.default_rng(0)
if args.bf16:
    from plumekit.models import build_model

    apply_fn = build_model(cfg).apply
    label = f"bf16 {args.arch}"
else:
    from plumekit.models.quantized_forward import (make_quantized_apply,
                                                   quantize_unet)

    calib = jnp.asarray(rng.random((4, T, T, cfg.in_channels), np.float32))
    variables = quantize_unet(variables, cfg, calib)
    apply_fn = make_quantized_apply(cfg)
    label = f"int8 {args.arch}"

icfg = InferConfig(tile_size=T, overlap=0, batch_tiles=BT)
print(f"backend: {jax.default_backend()}  {label}  {G}x{S}^2  tile {T}/0  "
      f"bt {BT}  repeats {R}")

image = jnp.asarray(rng.random((G, S, S, cfg.in_channels), np.float32))
mpix = G * S * S / 1e6

starts = tile_grid(S, T, T)
yy, xx = np.meshgrid(starts, starts, indexing="ij")
origins_np = np.stack([yy.reshape(-1), xx.reshape(-1)], -1).astype(np.int32)
n = origins_np.shape[0]
assert n % BT == 0
origins = jnp.asarray(origins_np).reshape(-1, BT, 2)

# pre-extracted tiles for the flat-forward leg: (G, n, T, T, C) is G*S^2*C
# fp32 — too big to keep alongside the canvas at 8192^2, so extract per
# scan step from the image INSIDE the program for every leg except `flat`,
# which uses a smaller standing tile stack scaled to the same pixel count
flat_reps = max(1, n // BT)


def gathered_scan(sigmoid: bool):
    def fn(variables, image):
        def per_granule(img):
            def step(c, o):
                tiles = jax.vmap(lambda oo: lax.dynamic_slice(
                    img, (oo[0], oo[1], 0), (T, T, cfg.in_channels)))(o)
                logits = apply_fn(variables, tiles, train=False)
                out = (jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
                       if sigmoid else logits[..., 0])
                return c + out.mean(), None

            acc, _ = lax.scan(step, jnp.float32(0), origins)
            return acc

        return jax.vmap(per_granule)(image).mean()

    return fn


def flat_forward(variables, image):
    # same FLOPs/pixels as one granule's grid, scanned in BT batches from a
    # standing (BT, T, T, C) stack perturbed per step; x G granules via the
    # leading mean to keep parity with the other legs' work
    def per_granule(img):
        base = lax.dynamic_slice(img, (0, 0, 0), (T, T, cfg.in_channels))
        tiles = jnp.broadcast_to(base, (BT, T, T, cfg.in_channels))

        def step(c, i):
            logits = apply_fn(variables, tiles + c * 1e-12, train=False)
            return c + logits[..., 0].mean(), None

        acc, _ = lax.scan(step, jnp.float32(0), jnp.arange(flat_reps))
        return acc

    return jax.vmap(per_granule)(image).mean()


def chain_time(name, fn):
    def repeated(variables, image):
        def body(_i, acc):
            return jnp.float32(fn(variables, image + acc * 1e-12))

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    out = rep(variables, image)
    jax.block_until_ready(out)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(rep(variables, image))
    dt = (time.perf_counter() - t0) / R
    print(f"{name:12s} {dt*1e3:8.1f} ms/program  {mpix/dt:7.1f} MPix/s")
    return dt


chain_time("flat", flat_forward)
chain_time("+gather", gathered_scan(sigmoid=False))
chain_time("+sigmoid", gathered_scan(sigmoid=True))

minfer = make_multi_granule_infer(apply_fn, icfg, channels=cfg.in_channels)
chain_time("full", lambda v, im: minfer(v, im)[0].mean())
