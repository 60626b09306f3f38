#!/usr/bin/env python
"""Classical-detector ladder: the reference's detectors quantified
head-to-head at the PLUME level.

The reference ships four detectors and validates them by eyeballing
PNGs (SURVEY.md §4); nothing in its history says which one is better,
by how much, or at what error mix. With `evaluate.object_counts` the
question is finally answerable: run each detector over N synthetic
scenes with known GT plumes and pool plume-level precision/recall/F1
(components matched one-to-one at IoU ≥ ``--match-iou``), plus pixel
IoU of the union mask.

Per-detector prediction artifact (each detector's own output form —
this measures the DESIGNS as shipped, not a common denominator):

* rg        → union of per-plume device masks (its native artifact);
* gaussian  → rasterised convex hulls (it emits hulls only);
* basic     → accepted components of its labelled image;
* (blob is an experiment module with no accept gate — excluded, as the
  reference itself never wired it into a pipeline.)

Both regimes: clean (the round-2 scene family) and false-plume (fire-
bearing distractor blobs). The U-Net row from the same dev protocol
(BASELINE.md) is the learned-model comparison point.

Usage: python experiments/detector_ladder.py [--scenes 20] [--cpu]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--scenes", type=int, default=20)
p.add_argument("--size", type=int, default=512)
p.add_argument("--match-iou", type=float, default=0.5)
p.add_argument("--min-size", type=int, default=100)
p.add_argument("--regime", choices=["clean", "false-plume", "both"],
               default="both")
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

from plumekit.config.identify import (BasicIdentifyConfig,
                                      GaussianIdentifyConfig,
                                      RGIdentifyConfig)
from plumekit.identify.api import identify
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.train.curated import rasterize_hulls
from plumekit.train.evaluate import (confusion_counts,
                                     metrics_from_counts, object_counts,
                                     object_metrics_from_counts)

SCENE = dict(n_plumes=3, background_level=0.2, background_noise=0.05,
             plume_amplitude=(0.6, 0.9), plume_sigma_major=(9.0, 16.0),
             plume_sigma_minor=(1.8, 2.8), fires_per_plume=(5, 8))
FALSE_EXTRA = dict(distractor_blobs=2, distractor_amplitude=(0.45, 0.75),
                   distractor_sigma=(7.0, 12.0))

print(f"backend: {jax.default_backend()}  scenes: {args.scenes}")


def pred_mask(detector: str, scene) -> np.ndarray:
    g = scene.granule
    date = scene.fires.date_time.iloc[0]
    if detector == "rg":
        ps = identify(g, scene.fires, date, RGIdentifyConfig(max_fires=32))
        m = np.zeros(g.shape, bool)
        for pm in ps.masks.values():
            m |= pm.astype(bool)
        return m
    if detector == "gaussian":
        ps = identify(g, scene.fires, date,
                      GaussianIdentifyConfig(min_fires_per_scene=5))
        return (rasterize_hulls(ps.hulls, g.shape) if len(ps.hulls)
                else np.zeros(g.shape, bool))
    if detector == "basic":
        ps = identify(g, scene.fires, date, BasicIdentifyConfig())
        if ps.labelled_image is None or not len(ps.aod_stats):
            return np.zeros(g.shape, bool)
        return np.isin(ps.labelled_image, ps.aod_stats.id.to_numpy())
    raise ValueError(detector)


results = {}
regimes = (["clean", "false-plume"] if args.regime == "both"
           else [args.regime])
for regime in regimes:
    extra = FALSE_EXTRA if regime == "false-plume" else {}
    scenes = [make_scene(SyntheticSceneConfig(
        size=args.size, seed=42000 + i, **SCENE, **extra))
        for i in range(args.scenes)]
    for det in ("rg", "gaussian", "basic"):
        obj = np.zeros(3, np.int64)
        pix = np.zeros(4, np.int64)
        t0 = time.perf_counter()
        for s in scenes:
            m = pred_mask(det, s)
            gt = s.gt_mask > 0.5
            obj += object_counts(m, gt, args.match_iou, args.min_size)
            pix += confusion_counts(m, gt)
        row = {**{k: round(v, 4) for k, v in
                  object_metrics_from_counts(obj).items()},
               "pixel_iou": round(metrics_from_counts(pix)["iou"], 4),
               "pred_plumes": int(obj[0] + obj[1]),
               "true_plumes": int(obj[0] + obj[2]),
               "wall_s": round(time.perf_counter() - t0, 1)}
        results[f"{regime}/{det}"] = row
        print(f"{regime}/{det}", row, flush=True)
print("RESULT " + json.dumps(results), flush=True)
