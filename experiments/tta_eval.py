#!/usr/bin/env python
"""TTA serving-quality study: what does the D4 ensemble buy, and at what
cost?

Trains the quality protocol once, then serves the SAME best checkpoint
through the full sliding pipeline four ways — fp32 and int8, each plain
and with D4 test-time augmentation (``plumekit.infer.tta``) — scoring
per-scene GT IoU and serve wall time. TTA is the serving menu's
more-quality-for-more-compute dial; the claim under test is that the
IoU lift survives the full stitched pipeline and composes with the int8
forward (BASELINE.md TTA row).

Weak-label legs (default) measure the production setting: a model
trained on noisy rg masks, where orientation averaging should smooth
boundary noise. ``--gt-labels`` trains on ground truth instead.

Usage: python experiments/tta_eval.py [--granules 60] [--size 512]
       [--cpu] [--gt-labels]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
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
p.add_argument("--gt-labels", action="store_true",
               help="train on GT masks instead of rg weak labels")
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
from plumekit.infer.tta import make_tta_apply
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.models import build_model
from plumekit.models.quantized_forward import (make_quantized_apply,
                                               quantize_unet)
from plumekit.train.data import GranuleSample, scene_to_sample
from plumekit.train.loop import train

SCENE = dict(n_plumes=3, background_level=0.2, background_noise=0.05,
             plume_amplitude=(0.6, 0.9), plume_sigma_major=(9.0, 16.0),
             plume_sigma_minor=(1.8, 2.8), fires_per_plume=(5, 8))

print(f"backend: {jax.default_backend()}  labels: "
      f"{'gt' if args.gt_labels else 'weak'}")

train_set = []
t0 = time.perf_counter()
for i in range(args.granules):
    scene = make_scene(SyntheticSceneConfig(size=args.size, seed=1000 + i,
                                            **SCENE))
    sample = scene_to_sample(scene)
    if args.gt_labels:
        train_set.append(sample)
        continue
    g = scene.granule
    _adf, _hdf, out = rg_mod.identify(
        g.first_layer(), g.lat, g.lon, scene.fires.date_time.iloc[0],
        scene.fires, RGIdentifyConfig(max_fires=32))
    weak = np.zeros(g.shape, np.float32)
    for f in np.nonzero(out["accepted"])[0]:
        weak[out["mask"][f]] = 1.0
    train_set.append(GranuleSample(channels=sample.channels, mask=weak))
print(f"labelled {args.granules} granules in {time.perf_counter()-t0:.1f} s")

dev_scenes = [make_scene(SyntheticSceneConfig(size=args.size,
                                              seed=77000 + i, **SCENE))
              for i in range(args.dev)]
dev = [scene_to_sample(s) for s in dev_scenes]

unet_cfg = UNetConfig(base_features=args.base, depth=args.depth)
ckpt_dir = "/tmp/tta_eval_ckpt"
shutil.rmtree(ckpt_dir, ignore_errors=True)
train_cfg = TrainConfig(total_steps=args.steps, batch_size=args.batch,
                        tile_size=args.tile, log_every=200, eval_every=100,
                        early_stop_patience=8, label_smooth=0.05,
                        checkpoint_dir=ckpt_dir)
t0 = time.perf_counter()
hist = train(unet_cfg=unet_cfg, train_cfg=train_cfg, data_cfg=DataConfig(),
             checkpoint=True, datasets=(train_set, dev))
print(f"trained in {time.perf_counter()-t0:.1f} s; best tile-dev IoU "
      f"{hist['best_dev_iou'][0]:.3f}")

from plumekit.train.checkpoint import restore_checkpoint
from plumekit.train.state import create_state

state = create_state(jax.random.PRNGKey(0), unet_cfg, train_cfg)
state = restore_checkpoint(ckpt_dir, state)
variables = {"params": state.params, "batch_stats": state.batch_stats}

icfg = InferConfig(tile_size=256 if args.size >= 256 else args.size,
                   overlap=32 if args.size >= 256 else 0, batch_tiles=16)
fp_apply = build_model(unet_cfg).apply
qvars = quantize_unet(variables, unet_cfg,
                      jnp.asarray(train_set[0].channels[None]))
legs = {
    "fp32": (make_sliding_infer(fp_apply, icfg, channels=2), variables),
    "fp32_tta": (make_sliding_infer(make_tta_apply(fp_apply), icfg,
                                    channels=2), variables),
    "int8": (make_sliding_infer(make_quantized_apply(unet_cfg), icfg,
                                channels=2), qvars),
    "int8_tta": (make_sliding_infer(
        make_tta_apply(make_quantized_apply(unet_cfg)), icfg,
        channels=2), qvars),
}


def iou(mask, gt):
    m, g = np.asarray(mask), gt > 0.5
    return float((m & g).sum() / max(1, (m | g).sum()))


out = {"granules": args.granules, "size": args.size, "base": args.base,
       "depth": args.depth, "labels": "gt" if args.gt_labels else "weak",
       "best_tile_dev_iou": round(hist["best_dev_iou"][0], 4)}
for name, (infer, v) in legs.items():
    # warm the per-shape program so serve_s measures the pipeline, not
    # compilation
    _ = infer(v, jnp.asarray(dev[0].channels))
    ious, t0 = [], time.perf_counter()
    for scene, sample in zip(dev_scenes, dev):
        probs, mask = infer(v, jnp.asarray(sample.channels))
        np.asarray(probs)   # force readback = sync
        ious.append(iou(mask, scene.gt_mask))
    out[name] = {"dev_iou": round(float(np.mean(ious)), 4),
                 "serve_s": round(time.perf_counter() - t0, 2)}
    print(name, out[name])

out["tta_iou_delta_fp32"] = round(
    out["fp32_tta"]["dev_iou"] - out["fp32"]["dev_iou"], 4)
out["tta_iou_delta_int8"] = round(
    out["int8_tta"]["dev_iou"] - out["int8"]["dev_iou"], 4)
print(json.dumps(out))
