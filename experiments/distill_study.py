#!/usr/bin/env python
"""Distillation study: does the UNet++ teacher transfer quality to the fast
U-Net serving body?

Round-3 context (BASELINE.md architecture ladder, same protocol): U-Net
0.736 GT-dev IoU at 324.8 MPix/s int8 serving vs UNet++ deep-supervised
0.813 at 114.6 — a quality/speed split. The distillation feature
(train/distill.py) claims to close it: train the teacher once, re-label
the training granules with its soft probabilities through the amortised
sliding-inference path, and train the cheap student on the blend.

This study measures that claim under the quality-loop protocol:

  leg 1  student baseline   U-Net on raw weak labels
  leg 2  teacher            UNet++ + deep supervision on the same weak
                            labels, best-dev state checkpointed
  leg 3+ distilled student  U-Net on alpha-blended teacher labels,
                            one leg per --alphas entry

All legs share the SAME weak-label set, GT dev set, schedule, and early
stopping, in one process (within-run comparison — the protocol's
run-to-run variance is ~±0.02, BASELINE.md). Dev IoU is always against
ground truth with the ORIGINAL labels (distill_samples never touches the
dev set), so the legs are directly comparable.

Usage:
  python experiments/distill_study.py                 # TPU full protocol
  python experiments/distill_study.py --cpu --granules 12 --size 256 \
      --base 16 --depth 3                             # CPU small-scale
"""

import os as _os
import sys as _sys

# repo-root import shim (scripts run as `python experiments/<name>.py`)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import shutil
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--granules", type=int, default=60)
p.add_argument("--size", type=int, default=512)
p.add_argument("--steps", type=int, default=3000)
p.add_argument("--batch", type=int, default=16)
p.add_argument("--tile", type=int, default=128)
p.add_argument("--smooth", type=float, default=0.05)
p.add_argument("--base", type=int, default=32)
p.add_argument("--depth", type=int, default=4)
p.add_argument("--alphas", default="0.7,1.0",
               help="comma list of distill blend weights (1.0 = pure "
                    "teacher labels)")
p.add_argument("--temp", type=float, default=1.0)
p.add_argument("--teacher-dir", default="/tmp/distill_study_teacher")
p.add_argument("--skip-baseline", action="store_true",
               help="skip leg 1 (reuse a same-protocol number from "
                    "BASELINE.md instead)")
p.add_argument("--tta", action="store_true",
               help="D4-average the teacher's soft labels (round-4 "
                    "teacher-quality dial)")
p.add_argument("--calibrate", default=None,
               help="'sweep' = sweep the teacher's pooled dev operating "
                    "curve and recenter its logits at the optimum; or an "
                    "explicit threshold value")
p.add_argument("--students", default="",
               help="extra student capacities as BASExDEPTH comma list "
                    "(e.g. 40x4,32x5) — each gets its own distill leg at "
                    "the FIRST alpha")
p.add_argument("--regime", choices=["clean", "false-plume"],
               default="clean",
               help="false-plume: distractor blobs + permissive labeller "
                    "(the quality_loop regime where curation pays)")
p.add_argument("--teacher-labels", choices=["weak", "curmask"],
               default="weak",
               help="curmask: train the teacher on GT-proxy-curated device "
                    "masks (the production recipe in the false-plume "
                    "regime: curation fixes the labels, the teacher "
                    "distils the fixed labels into the fast body)")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
alphas = [float(a) for a in args.alphas.split(",") if a.strip()]

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plumekit.config.identify import RGIdentifyConfig
from plumekit.config.train import (DataConfig, InferConfig, TrainConfig,
                                   UNetConfig)
from plumekit.identify import rg as rg_mod
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.train.data import GranuleSample, scene_to_sample
from plumekit.train.loop import train

print(f"backend: {jax.default_backend()}  granules: {args.granules}  "
      f"alphas: {alphas}")

SCENE = dict(n_plumes=3, background_level=0.2, background_noise=0.05,
             plume_amplitude=(0.6, 0.9), plume_sigma_major=(9.0, 16.0),
             plume_sigma_minor=(1.8, 2.8), fires_per_plume=(5, 8))
if args.regime == "false-plume":
    # the quality_loop false-plume regime: fire-bearing distractor blobs
    # + the shape gates dropped (practitioners loosen them on irregular
    # real plumes) — false positives become curation's job
    SCENE.update(distractor_blobs=2, distractor_amplitude=(0.45, 0.75),
                 distractor_sigma=(7.0, 12.0))
    IDENTIFY_CFG = RGIdentifyConfig(max_fires=32, side_ratio=1.0,
                                    max_peaks=99)
else:
    IDENTIFY_CFG = RGIdentifyConfig(max_fires=32)


def build_weak_set():
    """Weak (and, for --teacher-labels curmask, GT-proxy curated device
    mask) training sets. The curator mirrors quality_loop: keep each
    accepted plume iff its pixel precision vs GT is >= 0.5 — the
    reference's human decision, proxied."""
    weak_out, cur_out = [], []
    kept = dropped = 0
    t0 = time.perf_counter()
    for i in range(args.granules):
        scene = make_scene(SyntheticSceneConfig(
            size=args.size, seed=1000 + i, **SCENE))
        g = scene.granule
        date = scene.fires.date_time.iloc[0]
        _aod, _hulls, res = rg_mod.identify(
            g.first_layer(), g.lat, g.lon, date, scene.fires, IDENTIFY_CFG)
        sample = scene_to_sample(scene)
        gt = scene.gt_mask
        weak = np.zeros(g.shape, np.float32)
        cur = np.zeros(g.shape, np.float32)
        for f in np.nonzero(res["accepted"])[0]:
            m = res["mask"][f]
            weak[m] = 1.0
            prec = (m & (gt > 0.5)).sum() / max(int(m.sum()), 1)
            if prec >= 0.5:
                cur[m] = 1.0
                kept += 1
            else:
                dropped += 1
        weak_out.append(GranuleSample(channels=sample.channels, mask=weak))
        cur_out.append(GranuleSample(channels=sample.channels, mask=cur))
    print(f"weak-labelled {args.granules} granules in "
          f"{time.perf_counter() - t0:.1f} s (curator kept {kept}, "
          f"dropped {dropped})")
    return weak_out, cur_out


def gt_dev_set(n=8):
    return [scene_to_sample(make_scene(SyntheticSceneConfig(
        size=args.size, seed=77000 + i, **SCENE))) for i in range(n)]


weak_set, cur_set = build_weak_set()
teacher_set = cur_set if args.teacher_labels == "curmask" else weak_set
dev = gt_dev_set()

base_cfg = TrainConfig(
    total_steps=args.steps, batch_size=args.batch, tile_size=args.tile,
    log_every=200, eval_every=100, early_stop_patience=8,
    label_smooth=args.smooth,
)
# sliding-infer geometry for the distillation relabel pass: the measured
# 288/32 optimum where it fits, one whole-granule tile otherwise
distill_infer = (InferConfig() if args.size >= 288
                 else InferConfig(tile_size=args.size, overlap=0,
                                  batch_tiles=8))

student_cfg = UNetConfig(arch="unet", base_features=args.base,
                         depth=args.depth)
teacher_cfg = UNetConfig(arch="unetpp", base_features=args.base,
                         depth=args.depth, deep_supervision=True)

results = {}


def run(name, unet_cfg, train_cfg, checkpoint=False, train_set=None):
    t0 = time.perf_counter()
    hist = train(unet_cfg=unet_cfg, train_cfg=train_cfg,
                 data_cfg=DataConfig(), checkpoint=checkpoint,
                 datasets=(weak_set if train_set is None else train_set,
                           dev))
    results[name] = {
        "best_dev_iou": hist["best_dev_iou"][0],
        "best_step": hist["best_dev_step"][0],
        "train_s": round(time.perf_counter() - t0, 1),
    }
    print(name, results[name])


if not args.skip_baseline:
    run("student-weak", student_cfg, base_cfg)

# the teacher checkpoints so the distill legs can restore its best-dev
# state (train() prunes post-peak checkpoints: latest_step == best_step)
shutil.rmtree(args.teacher_dir, ignore_errors=True)
import dataclasses

run(f"teacher-unetpp-ds-{args.teacher_labels}", teacher_cfg,
    dataclasses.replace(base_cfg, checkpoint_dir=args.teacher_dir),
    checkpoint=True, train_set=teacher_set)

calibrate = None
if args.calibrate == "sweep":
    # the teacher's own pooled operating curve on the GT dev set — the
    # round-3 calibration artifact, computed inline so the distill legs
    # recenter at the teacher's true optimum (VERDICT round-3 next #3a)
    import jax.numpy as jnp

    from plumekit.infer import make_sliding_infer
    from plumekit.train.distill import load_teacher
    from plumekit.train.evaluate import best_threshold, sweep_thresholds

    t_apply, t_vars, t_cfg = load_teacher(args.teacher_dir)
    t_inf = make_sliding_infer(t_apply, distill_infer,
                               channels=t_cfg.in_channels)
    pairs = ((f"dev{i}", np.asarray(t_inf(t_vars,
                                          jnp.asarray(s.channels))[0]),
              s.mask > 0.5) for i, s in enumerate(dev))
    calibrate, cal_iou = best_threshold(sweep_thresholds(pairs),
                                        metric="iou")
    results["teacher-calibration"] = {"threshold": calibrate,
                                      "dev_iou_at_t": cal_iou}
    print(f"teacher calibrated threshold {calibrate:.2f} "
          f"(dev IoU {cal_iou:.4f} vs 0.5-default above)")
elif args.calibrate is not None:
    calibrate = float(args.calibrate)

distill_kw = dict(distill_from=args.teacher_dir, distill_temp=args.temp,
                  distill_infer=distill_infer, distill_tta=args.tta,
                  distill_calibrate=calibrate)
for alpha in alphas:
    run(f"student-distill-a{alpha:g}", student_cfg,
        dataclasses.replace(base_cfg, distill_alpha=alpha, **distill_kw))

for spec in (s for s in args.students.split(",") if s.strip()):
    sb, sd = (int(v) for v in spec.lower().split("x"))
    run(f"student-{sb}x{sd}-distill-a{alphas[0]:g}",
        UNetConfig(arch="unet", base_features=sb, depth=sd),
        dataclasses.replace(base_cfg, distill_alpha=alphas[0],
                            **distill_kw))

print(json.dumps(results))
