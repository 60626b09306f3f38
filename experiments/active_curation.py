#!/usr/bin/env python
"""Active curation study: does model-ranked review front-load curation?

The false-plume regime (BASELINE.md round 3) established that curation
pays +0.176 IoU when the weak labeller admits false plumes — but the
measurement assumed a curator who reviews EVERYTHING. Real curation has a
budget: the reference's selector presents plumes in file order
(plume_selector.py:189-221), so with B decisions a curator catches only
the false plumes that happen to land in the first B files.

plumekit.label.ranking orders the queue by model support instead: train
the U-Net on the weak labels, score every plume by its mean predicted
probability, review ascending. The confident-learning hypothesis
(arXiv:1911.00068) says the plumes the model disbelieves ARE the
mislabeled ones. This study measures that claim end to end:

1. N false-plume-regime granules, permissive rg weak labels; each
   accepted plume gets a GT verdict (drop iff <50% of its mask is true
   plume — the same proxy curator as every BASELINE.md curation row).
2. Train the U-Net on the raw weak labels (the model that will rank).
3. Score every plume through plumekit.label.plume_support on the model's
   own training granules (the production `select --rank-with-predictions`
   join, device masks).
4. Ranking quality: AUROC(false-plume vs support), recall@budget for the
   ranked queue vs the expected-value random queue (file order on seeded
   synthetic scenes IS a random queue).
5. (--train-legs) The payoff: labels curated under a B% budget down the
   ranked queue vs down a random queue, student per leg, GT-dev IoU —
   plus the weak (B=0) and fully-curated (B=100%) anchors within-run.

Usage: python experiments/active_curation.py [--granules 60] [--cpu]
       [--train-legs] [--budget 25]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np
import pandas as pd

p = argparse.ArgumentParser()
p.add_argument("--granules", type=int, default=60)
p.add_argument("--size", type=int, default=512)
p.add_argument("--steps", type=int, default=1500)
p.add_argument("--batch", type=int, default=16)
p.add_argument("--tile", type=int, default=128)
p.add_argument("--base", type=int, default=32)
p.add_argument("--depth", type=int, default=4)
p.add_argument("--budget", type=int, default=25,
               help="review budget as %% of detections, for --train-legs")
p.add_argument("--budgets", default="10,25,50,75",
               help="comma %% budgets for the recall curve")
p.add_argument("--train-legs", action="store_true",
               help="also train ranked-vs-random curated students at "
                    "--budget (4 extra training runs)")
p.add_argument("--seed", type=int, default=0,
               help="random-queue seed for the budget legs")
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

    probe_backend()   # bounded subprocess probe before committing to init

from plumekit.config.identify import RGIdentifyConfig
from plumekit.config.train import (DataConfig, InferConfig, TrainConfig,
                                   UNetConfig)
from plumekit.identify import rg as rg_mod
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.label.ranking import SUPPORT_COL, plume_support
from plumekit.train.data import GranuleSample, scene_to_sample
from plumekit.train.loop import train

print(f"backend: {jax.default_backend()}  granules: {args.granules}")

# the false-plume regime, verbatim from quality_loop.py: permissive gates
# + fire-bearing distractor blobs
identify_cfg = RGIdentifyConfig(max_fires=32, side_ratio=1.0, max_peaks=99)
SCENE_EXTRA = dict(distractor_blobs=2, distractor_amplitude=(0.45, 0.75),
                   distractor_sigma=(7.0, 12.0))
SCENE_KW = dict(size=args.size, n_plumes=3, background_level=0.2,
                background_noise=0.05, plume_amplitude=(0.6, 0.9),
                plume_sigma_major=(9.0, 16.0), plume_sigma_minor=(1.8, 2.8),
                fires_per_plume=(5, 8), **SCENE_EXTRA)


def build():
    """Label granules; per accepted plume record (granule, id, mask,
    gt_drop)."""
    samples, records, masks_by_g = [], [], []
    t0 = time.perf_counter()
    for i in range(args.granules):
        scene = make_scene(SyntheticSceneConfig(seed=1000 + i, **SCENE_KW))
        g = scene.granule
        date = scene.fires.date_time.iloc[0]
        _adf, _hdf, out = rg_mod.identify(
            g.first_layer(), g.lat, g.lon, date, scene.fires, identify_cfg)
        gt = scene.gt_mask
        weak = np.zeros(g.shape, np.float32)
        masks = {}
        for f in np.nonzero(out["accepted"])[0]:
            m = out["mask"][f]
            if not m.sum():
                continue
            weak[m] = 1.0
            masks[int(f)] = m
            records.append({
                "granule": i, "id": int(f),
                "gt_drop": bool((m & gt).sum() / m.sum() < 0.5)})
        samples.append(GranuleSample(
            channels=scene_to_sample(scene).channels, mask=weak))
        masks_by_g.append(masks)
    print(f"labelled {args.granules} granules in "
          f"{time.perf_counter() - t0:.1f} s: {len(records)} plumes, "
          f"{sum(r['gt_drop'] for r in records)} planted-false")
    return samples, pd.DataFrame(records), masks_by_g


def dev_set(n=8):
    return [scene_to_sample(make_scene(SyntheticSceneConfig(
        seed=77000 + i, **SCENE_KW))) for i in range(n)]


import shutil

samples, plumes, masks_by_g = build()
dev = dev_set()
unet_cfg = UNetConfig(base_features=args.base, depth=args.depth)
CKPT = "/tmp/active_curation_ckpt"
shutil.rmtree(CKPT, ignore_errors=True)   # a stale dir would RESUME the
# weak leg from a previous study's peak instead of training it


def run_leg(name, train_set, checkpoint=False):
    cfg = TrainConfig(total_steps=args.steps, batch_size=args.batch,
                      tile_size=args.tile, log_every=200, eval_every=100,
                      early_stop_patience=8, label_smooth=0.05,
                      checkpoint_dir=CKPT)
    t0 = time.perf_counter()
    hist = train(unet_cfg=unet_cfg, train_cfg=cfg, data_cfg=DataConfig(),
                 checkpoint=checkpoint, datasets=(train_set, dev))
    r = {"best_dev_iou": hist["best_dev_iou"][0],
         "best_step": hist["best_dev_step"][0],
         "train_s": round(time.perf_counter() - t0, 1)}
    print(name, r)
    return r


results = {"n_plumes": len(plumes),
           "n_false": int(plumes.gt_drop.sum()),
           "weak": run_leg("weak", samples, checkpoint=True)}

# --- rank every plume with the weak-trained model --------------------------
from plumekit.infer import make_sliding_infer
from plumekit.train.distill import load_teacher

apply_fn, variables, cfg = load_teacher(CKPT)
icfg = (InferConfig() if args.size >= 288
        else InferConfig(tile_size=args.size, overlap=0))
infer = make_sliding_infer(apply_fn, icfg, channels=cfg.in_channels)

t0 = time.perf_counter()
supports = np.full(len(plumes), np.nan)
for gi, (s, masks) in enumerate(zip(samples, masks_by_g)):
    if not masks:
        continue
    import jax.numpy as jnp

    probs = np.asarray(infer(variables, jnp.asarray(s.channels))[0])
    # the production join: one minimal hull row per plume; device masks
    # carry the pixel support (select --rank-with-predictions path)
    rows = pd.DataFrame({"id": list(masks), "datetime": "t0",
                         "hull_x": 0.0, "hull_y": 0.0})
    sc = plume_support(probs, rows, {str(k): v for k, v in masks.items()})
    for r in sc.itertuples():
        idx = plumes.index[(plumes.granule == gi)
                           & (plumes.id == r.id)][0]
        supports[idx] = getattr(r, SUPPORT_COL)
print(f"scored {len(plumes)} plumes in {time.perf_counter() - t0:.1f} s")
plumes["support"] = supports

# --- ranking quality --------------------------------------------------------
drop = plumes.gt_drop.to_numpy()
score = -np.nan_to_num(plumes.support.to_numpy(), nan=np.inf)  # high = suspect
order = np.argsort(-score, kind="stable")                      # suspect first


def auroc(y, s):
    """Mann-Whitney AUROC with tie handling (no sklearn dependency)."""
    ranks = pd.Series(s).rank().to_numpy()
    n1, n0 = int(y.sum()), int((~y).sum())
    if not n1 or not n0:
        return float("nan")
    return float((ranks[y].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))


results["auroc"] = round(auroc(drop, score), 4)
curve = {}
n, n_false = len(plumes), int(drop.sum())
for q in [int(x) for x in args.budgets.split(",")]:
    k = max(1, n * q // 100)
    caught = int(drop[order[:k]].sum())
    curve[q] = {"reviewed": k, "false_caught": caught,
                "recall": round(caught / n_false, 4),
                "random_recall": round(k / n, 4)}
results["recall_at_budget"] = curve
print("AUROC", results["auroc"], json.dumps(curve))

# --- budget training legs ---------------------------------------------------
if args.train_legs:
    def curated_samples(reviewed_idx):
        """Weak labels minus the reviewed-and-false plumes' masks (kept
        plumes keep their device-mask support — the curmask artifact)."""
        dropped = set(map(tuple, plumes.loc[
            sorted(set(reviewed_idx))].query("gt_drop")[
                ["granule", "id"]].to_numpy()))
        out = []
        for gi, (s, masks) in enumerate(zip(samples, masks_by_g)):
            m = np.zeros(s.mask.shape, np.float32)
            for f, pm in masks.items():
                if (gi, f) not in dropped:
                    m[pm] = 1.0
            out.append(GranuleSample(channels=s.channels, mask=m))
        return out

    k = max(1, n * args.budget // 100)
    rng = np.random.default_rng(args.seed)
    results[f"ranked@{args.budget}%"] = run_leg(
        f"ranked@{args.budget}%", curated_samples(order[:k]))
    results[f"random@{args.budget}%"] = run_leg(
        f"random@{args.budget}%",
        curated_samples(rng.permutation(n)[:k]))
    results["curmask@100%"] = run_leg(
        "curmask@100%", curated_samples(np.arange(n)))
    shutil.rmtree(CKPT, ignore_errors=True)

print(json.dumps(results))
