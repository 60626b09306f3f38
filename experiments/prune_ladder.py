#!/usr/bin/env python
"""UNet++ pruned-inference ladder: GT-dev IoU at every serving level.

The UNet++ paper's second headline (arXiv:1807.10165 §5, "model pruning")
is that a deep-supervised checkpoint serves TRUNCATED: head j depends only
on nodes X[i][k] with i+k <= j, so one training run yields a whole
speed/quality menu. plumekit ships this as ``predict_model --prune-level``
(models/unetpp.effective_level); this experiment measures what each level
costs in GT-dev IoU — trained ONCE on the small-scale quality protocol,
then served through the full sliding pipeline at L = 1..depth (fp32 and,
optionally, int8).

Usage: python experiments/prune_ladder.py [--cpu] [--int8]
       [--granules 12] [--size 256] [--steps 400]
"""

import os as _os
import sys as _sys

# repo-root import shim (scripts run as `python experiments/<name>.py`)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import shutil
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--granules", type=int, default=12)
p.add_argument("--size", type=int, default=256)
p.add_argument("--steps", type=int, default=400)
p.add_argument("--batch", type=int, default=8)
p.add_argument("--tile", type=int, default=128)
p.add_argument("--base", type=int, default=16)
p.add_argument("--depth", type=int, default=3)
p.add_argument("--dev", type=int, default=8)
p.add_argument("--int8", action="store_true",
               help="also serve each level through the int8 forward")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if not args.cpu:
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import _probe_backend

    _probe_backend()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from plumekit.config.train import (DataConfig, InferConfig, TrainConfig,
                                   UNetConfig)
from plumekit.infer import make_sliding_infer
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.models import build_model
from plumekit.train.data import scene_to_sample
from plumekit.train.loop import train

SCENE = dict(n_plumes=3, background_level=0.2, background_noise=0.05,
             plume_amplitude=(0.6, 0.9), plume_sigma_major=(9.0, 16.0),
             plume_sigma_minor=(1.8, 2.8), fires_per_plume=(5, 8))

print(f"backend: {jax.default_backend()}")

train_set = [scene_to_sample(make_scene(SyntheticSceneConfig(
    size=args.size, seed=1000 + i, **SCENE))) for i in range(args.granules)]
dev_scenes = [make_scene(SyntheticSceneConfig(
    size=args.size, seed=77000 + i, **SCENE)) for i in range(args.dev)]
dev = [scene_to_sample(s) for s in dev_scenes]

unet_cfg = UNetConfig(base_features=args.base, depth=args.depth,
                      arch="unetpp", deep_supervision=True)
ckpt_dir = "/tmp/prune_ladder_ckpt"
shutil.rmtree(ckpt_dir, ignore_errors=True)
train_cfg = TrainConfig(total_steps=args.steps, batch_size=args.batch,
                        tile_size=args.tile, log_every=100, eval_every=100,
                        early_stop_patience=8, label_smooth=0.05,
                        checkpoint_dir=ckpt_dir)

t0 = time.perf_counter()
hist = train(unet_cfg=unet_cfg, train_cfg=train_cfg, data_cfg=DataConfig(),
             checkpoint=True, datasets=(train_set, dev))
print(f"trained in {time.perf_counter() - t0:.1f} s; "
      f"best tile-dev IoU {hist['best_dev_iou'][0]:.3f}")

from plumekit.train.checkpoint import latest_step, restore_checkpoint
from plumekit.train.state import create_state

state = create_state(jax.random.PRNGKey(0), unet_cfg, train_cfg)
state = restore_checkpoint(ckpt_dir, state)
print(f"serving checkpoint step {latest_step(ckpt_dir)}")
variables = {"params": state.params, "batch_stats": state.batch_stats}

icfg = InferConfig(tile_size=args.tile, overlap=32, batch_tiles=16)


def iou(mask, gt):
    m, g = np.asarray(mask), gt > 0.5
    return float((m & g).sum() / max(1, (m | g).sum()))


def serve(infer, vs):
    per, secs = [], 0.0
    for scene, sample in zip(dev_scenes, dev):
        img = jnp.asarray(sample.channels)
        t = time.perf_counter()
        _probs, mask = infer(vs, img)
        jax.block_until_ready(mask)
        secs += time.perf_counter() - t
        per.append(iou(mask, scene.gt_mask))
    return float(np.mean(per)), secs


ladder = []
for level in range(1, args.depth + 1):
    cfg_l = dataclasses.replace(unet_cfg, prune_level=level)
    fp_infer = make_sliding_infer(build_model(cfg_l).apply, icfg, channels=2)
    fp_iou, fp_s = serve(fp_infer, variables)
    row = {"level": level, "fp32_dev_iou": round(fp_iou, 4),
           "fp32_serve_s": round(fp_s, 2)}
    if args.int8:
        from plumekit.models.quantized_forward import (make_quantized_apply,
                                                       quantize_unet)

        qvars = quantize_unet(variables, cfg_l,
                              jnp.asarray(train_set[0].channels[None]))
        q_infer = make_sliding_infer(make_quantized_apply(cfg_l), icfg,
                                     channels=2)
        q_iou, q_s = serve(q_infer, qvars)
        row.update(int8_dev_iou=round(q_iou, 4), int8_serve_s=round(q_s, 2))
    ladder.append(row)
    print(json.dumps(row))

out = {"granules": args.granules, "size": args.size, "steps": args.steps,
       "base": args.base, "depth": args.depth,
       "best_tile_dev_iou": round(hist["best_dev_iou"][0], 4),
       "ladder": ladder}
print(json.dumps(out))
