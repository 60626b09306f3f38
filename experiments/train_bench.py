#!/usr/bin/env python
"""Config-2 train-step benchmark (VERDICT round-3 item 6): re-measure the
fwd+bwd throughput under the chained timing protocol and sweep the
batch×tile geometry — the round-2 inference lesson (64×288² tile batches
beat bigger tiles ~2×) applied to training.

Each config scans STEPS train steps inside ONE jitted program (the
tunneled platform's ~45 ms per-dispatch latency would otherwise dominate),
chains every step's input on the previous step's loss (dedup-proof), and
syncs via a scalar readback.

Usage: python experiments/train_bench.py [--cpu] [--steps 10]
"""

import os as _os
import sys as _sys

# repo-root import shim: these scripts are run as
# `python experiments/<name>.py`, where sys.path[0] is experiments/
# and plumekit is not pip-installed on every host (round-3 capture
# failed on exactly this)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--steps", type=int, default=10)
p.add_argument("--geometries", default="8x512,16x384,32x256,64x192,64x288")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from plumekit.config.train import TrainConfig, UNetConfig
from plumekit.models.losses import dice_bce_loss
from plumekit.train.augment import augment_batch
from plumekit.train.state import create_state

print(f"backend: {jax.default_backend()}  steps/config: {args.steps}")

unet_cfg = UNetConfig()   # 32-base depth-4 bf16 — the config-2 model


def bench_geometry(batch: int, tile: int, augment: bool = True) -> float:
    state = create_state(jax.random.PRNGKey(0), unet_cfg,
                         TrainConfig(tile_size=tile, batch_size=batch))
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((batch, tile, tile, 2), np.float32))
    ys = jnp.asarray((rng.random((batch, tile, tile, 1)) > 0.8)
                     .astype(np.float32))

    def one_step(carry, _):
        st, key, acc = carry
        key, k1 = jax.random.split(key)
        x = xs + acc * 1e-12          # chain on the previous step's loss
        y = ys
        if augment:
            x, y = augment_batch(k1, x, y)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": st.batch_stats}
            logits, updates = st.apply_fn(
                variables, x, train=True, mutable=["batch_stats"])
            return dice_bce_loss(logits, y, 0.5), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params)
        st = st.apply_gradients(grads=grads)
        st = st.replace(batch_stats=new_stats)
        return (st, key, loss), None

    @jax.jit
    def run(state):
        carry, _ = lax.scan(
            one_step, (state, jax.random.PRNGKey(1), jnp.float32(0)),
            None, length=args.steps)
        return carry[2]

    _ = float(run(state))                     # compile + warm-up
    t0 = time.perf_counter()
    _ = float(run(state))
    dt = time.perf_counter() - t0
    ms = dt / args.steps * 1e3
    mpix = batch * tile * tile * args.steps / dt / 1e6
    print(f"batch {batch:3d} x {tile}²  {ms:8.1f} ms/step  "
          f"{mpix:7.2f} MPix/s")
    return mpix


results = {}
for geom in args.geometries.split(","):
    b, t = geom.strip().split("x")
    results[geom] = bench_geometry(int(b), int(t))

best = max(results, key=results.get)
print(f"\nbest geometry: {best} at {results[best]:.2f} MPix/s")
