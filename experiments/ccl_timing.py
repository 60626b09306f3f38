#!/usr/bin/env python
"""Device identify stage timing under the platform's timing discipline
(VERDICT round-2 item 1): all repeats chained INSIDE one jit (per-dispatch
latency ~45 ms, identical dispatches deduped, block_until_ready no-op),
sync via scalar readback. Stages are separate chained programs; their
differences attribute the time.

Usage: python experiments/ccl_timing.py [--size 1200] [--repeats 3] [--cpu]
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
p.add_argument("--size", type=int, default=1200)
p.add_argument("--repeats", type=int, default=3)
p.add_argument("--cpu", action="store_true")
p.add_argument("--host", action="store_true", help="also time host oracle")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plumekit.config.identify import RGIdentifyConfig
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.identify.pipeline import SweepStatics, cached_sweep_identifier
from plumekit.identify.rg import _statics
from plumekit.io.fires import subset_fires_to_image
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.ops.cluster import mean_cluster_positions
from plumekit.ops.ccl import connected_components
from plumekit.ops.morphology import binary_opening_cross

R = args.repeats
print(f"backend: {jax.default_backend()}  size: {args.size}  repeats: {R}")

scene = make_scene(SyntheticSceneConfig(
    size=args.size, n_plumes=9, seed=0,
    background_level=0.2, background_noise=0.05,
    plume_amplitude=(0.6, 0.8), plume_sigma_major=(9.0, 14.0),
    plume_sigma_minor=(1.8, 2.6), fires_per_plume=(7, 9), extra_fires=4,
))
aod = scene.granule.first_layer()
cfg = RGIdentifyConfig()
date = scene.fires.date_time.iloc[0]

fire_subset = subset_fires_to_image(scene.granule.lat, scene.granule.lon,
                                    scene.fires, date, min_frp=cfg.min_frp)
clusters = mean_cluster_positions(fire_subset, cfg.cluster_dist_km)
rows, cols = locate_fires_in_image(clusters.latitude, clusters.longitude,
                                   scene.granule.lat, scene.granule.lon,
                                   cfg.win_half)
f_rows, f_cols, f_valid = pad_fires(rows, cols, cfg.max_fires)
print(f"fire clusters: {len(rows)}")

aod_j = jnp.asarray(aod, jnp.float32)
th_j = jnp.asarray(np.asarray(cfg.thresholds, np.float32))
null_j = jnp.zeros(aod.shape, bool)
fr = jnp.asarray(f_rows)
fc = jnp.asarray(f_cols)
fv = jnp.asarray(f_valid)

fn = cached_sweep_identifier(_statics(cfg))


def chain_time(label, program):
    """program(aod_perturbed) -> scalar; run R chained reps in one jit."""

    def repeated(aod_j):
        def body(_i, acc):
            return acc * 1e-12 + program(aod_j + acc * 1e-12)
        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    _ = float(rep(aod_j))                    # compile + warm
    t0 = time.perf_counter()
    _ = float(rep(aod_j))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:46s} {dt*1e3:9.1f} ms/scene")
    return dt


def prog_masks(a):
    masks = a[None] > th_j[:, None, None]
    opened = binary_opening_cross(masks)
    return jnp.sum(opened).astype(jnp.float32)


def prog_ccl(a):
    masks = a[None] > th_j[:, None, None]
    opened = binary_opening_cross(masks)

    def label_one(prev, m):
        lbl = connected_components(m, connectivity=2, init_labels=prev)
        return lbl, lbl

    _, labels_all = lax.scan(label_one,
                             jnp.zeros(a.shape, jnp.int32), opened)
    return jnp.sum(labels_all % 97).astype(jnp.float32)


def prog_ccl_cold(a):
    masks = a[None] > th_j[:, None, None]
    opened = binary_opening_cross(masks)

    def label_one(m):
        return connected_components(m, connectivity=2)

    labels_all = lax.map(label_one, opened)
    return jnp.sum(labels_all % 97).astype(jnp.float32)


def prog_full(a):
    out = fn(a, a, null_j, th_j, fr, fc, fv)
    return (jnp.sum(out["extents"]).astype(jnp.float32)
            + jnp.sum(out["accepted"]))


dt_masks = chain_time("masks + opening", prog_masks)
dt_cold = chain_time("+ CCL cold per threshold (lax.map)", prog_ccl_cold)
dt_warm = chain_time("+ CCL warm-start scan", prog_ccl)
dt_full = chain_time("full sweep pipeline (new)", prog_full)
print(f"\nstages: masks={dt_masks:.3f}s cclΔcold={dt_cold-dt_masks:.3f}s "
      f"cclΔwarm={dt_warm-dt_masks:.3f}s restΔ={dt_full-dt_warm:.3f}s "
      f"full={dt_full:.3f}s")

if args.host:
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from oracle_rg import oracle_identify

    t0 = time.perf_counter()
    oracle_identify(aod, rows, cols, cfg)
    t1 = time.perf_counter()
    oracle_identify(aod, rows, cols, cfg)
    dt = (time.perf_counter() - t1)
    print(f"{'host oracle identify':46s} {dt*1e3:9.1f} ms/scene")
