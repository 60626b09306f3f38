#!/usr/bin/env python
"""Per-stage attribution of the identify sweep at a given scene size.

Round-4 context: 1200² runs 72 ms/scene with a ~44 ms masks+opening+CCL
core (round 2), and 4096² measures 978 ms — to cut either, the residual
must be attributed. Times CUMULATIVE stages of the real pipeline program
under the chained discipline:

  core     masks + opening + multi-threshold CCL (the Pallas megakernel)
  +winsz   + (T, F) window label lookups + per-fire size counts (extents)
  +tidx    + the threshold-index rule
  full     the complete cached_sweep_identifier program (assess a/b, all
           gates, transects)

Usage: python experiments/identify_stage_probe.py [--size 1200] [--cpu]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--size", type=int, default=1200)
p.add_argument("--repeats", type=int, default=3)
p.add_argument("--cpu", action="store_true")
p.add_argument("--stages", default="core,winsz,tidx,full",
               help="comma list of stages to time (the non-full stages "
               "use the unfused labels path, which falls back to the XLA "
               "scan beyond the VMEM gate — skip them at 8192²)")
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

from plumekit.config.identify import RGIdentifyConfig
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.identify.pipeline import (SweepStatics, _threshold_index,
                                        cached_sweep_identifier)
from plumekit.identify.rg import _statics
from plumekit.io.fires import subset_fires_to_image
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.ops.cluster import mean_cluster_positions
from plumekit.ops.morphology import binary_opening_cross
from plumekit.ops.segment import label_window_nearest

cfg = RGIdentifyConfig()
s: SweepStatics = _statics(cfg)
R = args.repeats

scene = make_scene(SyntheticSceneConfig(
    size=args.size, n_plumes=9, seed=0, background_level=0.2,
    background_noise=0.05, plume_amplitude=(0.6, 0.8),
    plume_sigma_major=(9.0, 14.0), plume_sigma_minor=(1.8, 2.6),
    fires_per_plume=(7, 9), extra_fires=4))
aod = scene.granule.first_layer()
date = scene.fires.date_time.iloc[0]
sub = subset_fires_to_image(scene.granule.lat, scene.granule.lon,
                            scene.fires, date, min_frp=cfg.min_frp)
clusters = mean_cluster_positions(sub, cfg.cluster_dist_km)
rows, cols = locate_fires_in_image(clusters.latitude, clusters.longitude,
                                   scene.granule.lat, scene.granule.lon,
                                   cfg.win_half)
fr, fc, fv = pad_fires(rows, cols, cfg.max_fires, bucket=True)
fr_j, fc_j, fv_j = jnp.asarray(fr), jnp.asarray(fc), jnp.asarray(fv)
th = jnp.asarray(np.asarray(cfg.thresholds, np.float32))
aod_j = jnp.asarray(aod, jnp.float32)
nulls = jnp.zeros(aod.shape, bool)
print(f"backend: {jax.default_backend()}  size: {args.size}  "
      f"fires: {len(rows)}  T: {th.shape[0]}")


def labels_of(aod_det, thresholds):
    from plumekit.ops.pallas.ccl_sweep import (multi_threshold_ccl,
                                               sweep_fits_vmem)
    from plumekit.ops.ccl import ccl_backend, connected_components

    masks = aod_det[None, :, :] > thresholds[:, None, None]
    opened = binary_opening_cross(masks)
    if ccl_backend() == "pallas" and sweep_fits_vmem(*opened.shape[-2:]):
        return multi_threshold_ccl(opened, connectivity=2)
    def label_one(prev, m):
        lbl = connected_components(m, connectivity=2, init_labels=prev)
        return lbl, lbl
    _, labels_all = jax.lax.scan(
        label_one, jnp.zeros(aod_det.shape, jnp.int32), opened)
    return labels_all


def core(aod_det):
    return jnp.sum(labels_of(aod_det, th)[:, ::37, ::37].astype(jnp.float32))


def winsz(aod_det):
    labels_all = labels_of(aod_det, th)
    lab_tf, found_tf = jax.vmap(
        lambda lab: jax.vmap(
            lambda r, c: label_window_nearest(lab, r, c, s.win_half)
        )(fr_j, fc_j))(labels_all)
    sizes_tf = jax.vmap(
        lambda lab_img, labs: jnp.sum(
            lab_img[None, :, :] == labs[:, None, None], axis=(1, 2),
            dtype=jnp.int32))(labels_all, lab_tf)
    extents = jnp.where(found_tf & fv_j[None, :], sizes_tf, 0)
    return jnp.sum(extents).astype(jnp.float32)


def tidx(aod_det):
    labels_all = labels_of(aod_det, th)
    lab_tf, found_tf = jax.vmap(
        lambda lab: jax.vmap(
            lambda r, c: label_window_nearest(lab, r, c, s.win_half)
        )(fr_j, fc_j))(labels_all)
    sizes_tf = jax.vmap(
        lambda lab_img, labs: jnp.sum(
            lab_img[None, :, :] == labs[:, None, None], axis=(1, 2),
            dtype=jnp.int32))(labels_all, lab_tf)
    extents = jnp.where(found_tf & fv_j[None, :], sizes_tf, 0)
    ti, has = jax.vmap(
        lambda e: _threshold_index(e, s.reject_last_threshold), in_axes=1
    )(extents)
    return jnp.sum(ti).astype(jnp.float32) + jnp.sum(has)


full_fn = cached_sweep_identifier(s)


def full(aod_det):
    out = full_fn(aod_det, aod_det, nulls, th, fr_j, fc_j, fv_j)
    return (jnp.sum(out["extents"]).astype(jnp.float32)
            + jnp.sum(out["accepted"]))


def chain_time(name, fn):
    def repeated(a):
        def body(_i, acc):
            return jnp.float32(fn(a + acc * 1e-12)) * 1e-12

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    _ = float(rep(aod_j))
    t0 = time.perf_counter()
    _ = float(rep(aod_j))
    dt = (time.perf_counter() - t0) / R
    print(f"{name:8s} {dt*1e3:8.1f} ms/scene")
    return dt


stages = {"core": ("core", core), "winsz": ("+winsz", winsz),
          "tidx": ("+tidx", tidx), "full": ("full", full)}
for key in args.stages.split(","):
    name, fn = stages[key.strip()]
    chain_time(name, fn)
