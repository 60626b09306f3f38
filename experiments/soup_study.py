#!/usr/bin/env python
"""Checkpoint-averaging (SWA/soup) study: does averaging the trailing
checkpoints around the dev peak beat serving the peak alone?

The weak-label protocol's dev curve is peaky (it rises, peaks, then
degrades on label-noise overfitting — BASELINE.md round-2 rows), which
is exactly the regime where stochastic weight averaging classically
helps: nearby SGD iterates straddle the basin and their average sits
deeper than any single one (Izmailov et al., arXiv:1803.05407). The
train loop already persists interval checkpoints (checkpoint_every)
and the peak; this study averages the trailing K of them (uniform
param soup, BN running stats averaged too — the eval path uses them
frozen) and scores soup-vs-peak on the GT dev scenes, each at its own
swept decision threshold so the comparison is between CALIBRATED
operating points, not raw 0.5 masks.

Outcome either ships a `--soup K` serving lever or records a measured
negative next to the TTA row.

Usage: python experiments/soup_study.py [--granules 60] [--cpu]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import shutil
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--granules", type=int, default=60)
p.add_argument("--size", type=int, default=512)
p.add_argument("--steps", type=int, default=1500)
p.add_argument("--batch", type=int, default=16)
p.add_argument("--tile", type=int, default=128)
p.add_argument("--base", type=int, default=32)
p.add_argument("--depth", type=int, default=4)
p.add_argument("--dev", type=int, default=8)
p.add_argument("--soups", default="2,3,5",
               help="comma K values: average the trailing K checkpoints "
                    "ending at the peak")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if not args.cpu:
    from plumekit.utils.backend import probe_backend

    probe_backend()

import jax.numpy as jnp

from plumekit.config.identify import RGIdentifyConfig
from plumekit.config.train import (DataConfig, InferConfig, TrainConfig,
                                   UNetConfig)
from plumekit.identify import rg as rg_mod
from plumekit.infer import make_sliding_infer
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.models import build_model
from plumekit.train.checkpoint import restore_checkpoint
from plumekit.train.data import GranuleSample, scene_to_sample
from plumekit.train.evaluate import best_threshold, sweep_thresholds
from plumekit.train.loop import train
from plumekit.train.state import create_state

SCENE = dict(n_plumes=3, background_level=0.2, background_noise=0.05,
             plume_amplitude=(0.6, 0.9), plume_sigma_major=(9.0, 16.0),
             plume_sigma_minor=(1.8, 2.8), fires_per_plume=(5, 8))

print(f"backend: {jax.default_backend()}")

train_set = []
t0 = time.perf_counter()
for i in range(args.granules):
    s = make_scene(SyntheticSceneConfig(size=args.size, seed=1000 + i,
                                        **SCENE))
    sample = scene_to_sample(s)
    g = s.granule
    _a, _h, o = rg_mod.identify(g.first_layer(), g.lat, g.lon,
                                s.fires.date_time.iloc[0], s.fires,
                                RGIdentifyConfig(max_fires=32))
    weak = np.zeros(g.shape, np.float32)
    for f in np.nonzero(o["accepted"])[0]:
        weak[o["mask"][f]] = 1.0
    train_set.append(GranuleSample(channels=sample.channels, mask=weak))
print(f"labelled {args.granules} granules in "
      f"{time.perf_counter()-t0:.0f} s", flush=True)

dev_scenes = [make_scene(SyntheticSceneConfig(size=args.size,
                                              seed=77000 + i, **SCENE))
              for i in range(args.dev)]
dev = [scene_to_sample(s) for s in dev_scenes]

unet_cfg = UNetConfig(base_features=args.base, depth=args.depth)
ckpt = "/tmp/soup_study_ckpt"
shutil.rmtree(ckpt, ignore_errors=True)
# checkpoint_every == eval_every so every eval point leaves an iterate
# to soup; early stopping prunes post-peak steps, leaving 100..best
tcfg = TrainConfig(total_steps=args.steps, batch_size=args.batch,
                   tile_size=args.tile, log_every=200, eval_every=100,
                   checkpoint_every=100, early_stop_patience=8,
                   label_smooth=0.05, checkpoint_dir=ckpt)
hist = train(unet_cfg=unet_cfg, train_cfg=tcfg, data_cfg=DataConfig(),
             checkpoint=True, datasets=(train_set, dev))
best_step = int(hist["best_dev_step"][0])
print(f"peak @ {best_step} (tile-dev {hist['best_dev_iou'][0]:.3f})",
      flush=True)

steps = sorted(int(d.rsplit("_", 1)[1]) for d in os.listdir(ckpt)
               if d.startswith("step_"))
print("checkpoint trail:", steps, flush=True)


def load_vars(step):
    state = create_state(jax.random.PRNGKey(0), unet_cfg, tcfg)
    state = restore_checkpoint(ckpt, state, step)
    v = {"params": state.params}
    if state.batch_stats is not None:
        v["batch_stats"] = state.batch_stats
    return v


def average(trees):
    return jax.tree_util.tree_map(
        lambda *xs: jnp.mean(jnp.stack(
            [jnp.asarray(x, jnp.float32) for x in xs]), axis=0), *trees)


icfg = (InferConfig(tile_size=256, overlap=32, batch_tiles=16)
        if args.size >= 256 else InferConfig(tile_size=args.size, overlap=0))
infer = make_sliding_infer(build_model(unet_cfg).apply, icfg, channels=2)


def calibrated(name, variables):
    def pairs():
        for sc, sa in zip(dev_scenes, dev):
            probs, _ = infer(variables, jnp.asarray(sa.channels))
            yield name, np.asarray(probs), sc.gt_mask > 0.5

    sweep = sweep_thresholds(pairs())
    t, v = best_threshold(sweep)
    half = float(sweep.loc[(sweep.threshold - 0.5).abs().idxmin(), "iou"])
    return {"iou_at_0.5": round(half, 4), "best_t": t,
            "best_iou": round(v, 4)}


out = {"peak_step": best_step, "trail": steps}
out["peak"] = calibrated("peak", load_vars(best_step))
print("peak", out["peak"], flush=True)
for k in [int(x) for x in args.soups.split(",")]:
    members = [s for s in steps if s <= best_step][-k:]
    if len(members) < 2:
        continue
    soup = average([load_vars(s) for s in members])
    out[f"soup{k}"] = {**calibrated(f"soup{k}", soup),
                       "members": members}
    print(f"soup{k}", out[f"soup{k}"], flush=True)
print("RESULT " + json.dumps(out), flush=True)
