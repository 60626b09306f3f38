#!/usr/bin/env python
"""Int8 serving-quality study: does the s8 forward cost any GT-dev IoU?

Trains the small-scale quality protocol (synthetic scenes, GT masks,
dev-IoU early stopping), then serves the best state through the FULL
sliding-window pipeline twice — fp32 ``UNet.apply`` vs the int8
post-training-quantized forward (``models/quantized_forward``, calibrated
on one training granule) — and reports per-scene GT IoU for both plus the
pixel mask-flip rate between them.

The claim under test (BASELINE.md int8 row): quantization error is below
run-to-run noise, i.e. the 2× MXU rate is free at serving time.

Usage: python experiments/int8_eval.py [--granules 12] [--size 256]
       [--steps 400] [--cpu]
"""

import os as _os
import sys as _sys

# repo-root import shim: these scripts are run as
# `python experiments/<name>.py`, where sys.path[0] is experiments/
# and plumekit is not pip-installed on every host (round-3 capture
# failed on exactly this)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
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
p.add_argument("--arch", choices=["unet", "unetpp"], default="unet")
p.add_argument("--deep-supervision", action="store_true")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if not args.cpu:
    # bounded subprocess probe before committing this process to backend
    # init: a dead tunnel otherwise blocks ~25 min and caches the failure
    # (CLAUDE.md round-3 rule; same discipline as bench.py)
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

from plumekit.config.train import DataConfig, InferConfig, TrainConfig, UNetConfig
from plumekit.infer import make_sliding_infer
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.models import build_model
from plumekit.models.quantized_forward import (make_quantized_apply,
                                               quantize_unet)
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
                      arch=args.arch,
                      deep_supervision=args.deep_supervision)
ckpt_dir = "/tmp/int8_eval_ckpt"
import shutil

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
fp_infer = make_sliding_infer(build_model(unet_cfg).apply, icfg,
                              channels=2)
qvars = quantize_unet(variables, unet_cfg,
                      jnp.asarray(train_set[0].channels[None]))
q_infer = make_sliding_infer(make_quantized_apply(unet_cfg), icfg,
                             channels=2)


def iou(mask, gt):
    m, g = np.asarray(mask), gt > 0.5
    return float((m & g).sum() / max(1, (m | g).sum()))


rows = []
for scene, sample in zip(dev_scenes, dev):
    img = jnp.asarray(sample.channels)
    _fp_p, fp_m = fp_infer(variables, img)
    _q_p, q_m = q_infer(qvars, img)
    rows.append({
        "fp32_iou": iou(fp_m, scene.gt_mask),
        "int8_iou": iou(q_m, scene.gt_mask),
        "flip": float((np.asarray(fp_m) != np.asarray(q_m)).mean()),
    })

fp = np.mean([r["fp32_iou"] for r in rows])
q8 = np.mean([r["int8_iou"] for r in rows])
flip = np.mean([r["flip"] for r in rows])
out = {"granules": args.granules, "size": args.size,
       "steps": args.steps, "base": args.base, "depth": args.depth,
       "arch": args.arch, "deep_supervision": args.deep_supervision,
       "best_tile_dev_iou": round(hist["best_dev_iou"][0], 4),
       "fp32_dev_iou": round(float(fp), 4),
       "int8_dev_iou": round(float(q8), 4),
       "iou_delta": round(float(q8 - fp), 4),
       "mask_flip_rate": round(float(flip), 6)}
print(json.dumps(out))
