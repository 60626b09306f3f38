#!/usr/bin/env python
"""Train-step roofline attribution (VERDICT round-4 #2).

The 64×288² fwd+bwd step runs ~46.8 MPix/s while the same model's bf16
inference forward serves 293.9 MPix/s fast-tiling; fwd+bwd ≈ 3× forward
FLOPs implies ~98 — where does the other half go? Times CUMULATIVE
stages of the REAL step core (train/step.py) under the chained one-jit
discipline (state carried through the fori so every step really runs):

  infer_fwd   model.apply train=False (the serving forward, reference)
  train_fwd   train=True forward (BN batch stats live)
  +loss       + dice_bce
  +grad       + value_and_grad (backward)
  +opt        + apply_gradients + BN stats replace (the full core, no aug)
  full        + augment_batch (the shipped step)

plus ablation variants: label_smooth, bf16-vs-fp32 loss domain, and
GroupNorm (BN's train-mode reductions are a candidate cost).

Usage: python experiments/train_roofline_probe.py [--cpu] [--batch 64]
       [--tile 288]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--batch", type=int, default=64)
p.add_argument("--tile", type=int, default=288)
p.add_argument("--repeats", type=int, default=8)
p.add_argument("--norm", default="batch")
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from plumekit.config.train import TrainConfig, UNetConfig
from plumekit.models.losses import dice_bce_loss
from plumekit.train.augment import augment_batch
from plumekit.train.state import create_state

B, T, R = args.batch, args.tile, args.repeats
MPIX = B * T * T / 1e6
print(f"backend: {jax.default_backend()}  batch {B} x {T}²  "
      f"({MPIX:.1f} MPix/step)  norm={args.norm}")

unet_cfg = UNetConfig(norm=args.norm)
train_cfg = TrainConfig(tile_size=T, batch_size=B)
state0 = create_state(jax.random.PRNGKey(0), unet_cfg, train_cfg)
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.random((B, T, T, 2), np.float32))
ys = jnp.asarray((rng.random((B, T, T, 1)) > 0.8).astype(np.float32))
key = jax.random.PRNGKey(7)


def chain_state(name, body):
    """body(state, xs, i) -> (state, scalar); chained R times in one jit
    with the state carried so no step can be deduped/elided."""

    def repeated(state, xs):
        def it(i, carry):
            st, acc = carry
            st, v = body(st, xs + acc * 1e-12, i)
            return st, v * 1e-12

        _, acc = lax.fori_loop(0, R, it, (state, jnp.float32(0)))
        return acc

    rep = jax.jit(repeated, donate_argnums=())
    t0 = time.perf_counter()
    _ = float(rep(state0, xs))
    print(f"{name:12s} compile+warm {time.perf_counter()-t0:6.1f} s",
          flush=True)
    t0 = time.perf_counter()
    _ = float(rep(state0, xs))
    dt = (time.perf_counter() - t0) / R
    print(f"{name:12s} {dt*1e3:8.1f} ms/step  {MPIX/dt:6.1f} MPix/s",
          flush=True)
    return dt


def fwd(state, x, train):
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    if train and state.batch_stats is not None:
        logits, updates = state.apply_fn(variables, x, train=True,
                                         mutable=["batch_stats"])
        return logits, updates["batch_stats"]
    return state.apply_fn(variables, x, train=train), None


chain_state("infer_fwd", lambda st, x, i: (
    st, jnp.sum(fwd(st, x, False)[0]).astype(jnp.float32)))

chain_state("train_fwd", lambda st, x, i: (
    st, jnp.sum(fwd(st, x, True)[0]).astype(jnp.float32)))


def with_loss(st, x, i):
    logits, _ = fwd(st, x, True)
    return st, dice_bce_loss(logits, ys, 0.5)


chain_state("+loss", with_loss)


def with_grad(st, x, i):
    def loss_fn(params):
        variables = {"params": params}
        if st.batch_stats is not None:
            variables["batch_stats"] = st.batch_stats
            logits, updates = st.apply_fn(variables, x, train=True,
                                          mutable=["batch_stats"])
        else:
            logits, updates = st.apply_fn(variables, x, train=True), None
        return dice_bce_loss(logits, ys, 0.5), updates

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
    # consume grads without applying (attribution isolates the optimizer)
    gsum = sum(jnp.sum(g).astype(jnp.float32)
               for g in jax.tree_util.tree_leaves(grads))
    return st, loss + gsum * 1e-20


chain_state("+grad", with_grad)

from plumekit.train.step import _make_step_core

core_noaug = _make_step_core(0.5, False, 0.0)
chain_state("+opt", lambda st, x, i: (
    lambda out: (out[0], out[1]["loss"]))(
        core_noaug(st, x, ys, jax.random.fold_in(key, i))))

core_full = _make_step_core(0.5, True, 0.0)
chain_state("full", lambda st, x, i: (
    lambda out: (out[0], out[1]["loss"]))(
        core_full(st, x, ys, jax.random.fold_in(key, i))))

core_smooth = _make_step_core(0.5, True, 0.05)
chain_state("full+smooth", lambda st, x, i: (
    lambda out: (out[0], out[1]["loss"]))(
        core_smooth(st, x, ys, jax.random.fold_in(key, i))))
