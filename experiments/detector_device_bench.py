#!/usr/bin/env python
"""Device throughput of each classical detector's per-scene program.

rg has carried the identify perf story since round 1; this harness gives
the other device detectors their own measured ms/scene rows under the
SAME chained one-jit discipline (repeats looped inside the program, each
iteration's input perturbed by the previous output, scalar-readback
sync — the tunnel rules from bench.py):

  rg        the full cached_sweep_identifier program (T=20 production
            thresholds): masks+opening+CCL, window/counts, assess/gates
  gaussian  ONE ORBIT LAYER's device work (plume_identifier_gaussian_
            profile.py:464-518): JFA null inpaint + the three threshold
            sweeps (0.02/0.03/0.04 steps, T=25 each — one compiled
            program, three calls). Fire clustering is per-granule, not
            per-layer, and is excluded (cluster_fire_centroids docstring)
  basic     the fixed-threshold program (plume_identifier_basic.py):
            21x21 ratio screen, 0.2 mask + opening + single-plane CCL,
            dup/size gates, bboxes. NOTE the design envelope finding
            (detector_ladder): at background 0.2 the mask percolates,
            so this times the detector's worst-case CCL regime.

Usage: python experiments/detector_device_bench.py [--size 1200] [--cpu]
       [--detectors rg,gaussian,basic]
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
p.add_argument("--detectors", default="rg,gaussian,basic")
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

from plumekit.config.identify import (BasicIdentifyConfig,
                                      GaussianIdentifyConfig,
                                      RGIdentifyConfig)
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.identify.pipeline import (cached_sweep_identifier,
                                        validate_descending_thresholds)
from plumekit.io.fires import subset_fires_to_image
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.ops.cluster import mean_cluster_positions
from plumekit.ops.inpaint import nearest_fill

R = args.repeats
scene = make_scene(SyntheticSceneConfig(
    size=args.size, n_plumes=9, seed=0, background_level=0.2,
    background_noise=0.05, plume_amplitude=(0.6, 0.8),
    plume_sigma_major=(9.0, 14.0), plume_sigma_minor=(1.8, 2.6),
    fires_per_plume=(7, 9), extra_fires=4))
aod = np.asarray(scene.granule.first_layer(), np.float32)
lat, lon = scene.granule.lat, scene.granule.lon
date = scene.fires.date_time.iloc[0]
aod_j = jnp.asarray(aod)
nulls = jnp.zeros(aod.shape, bool)
print(f"backend: {jax.default_backend()}  size: {args.size}")


def chain_time(name, fn, x):
    def repeated(a):
        def body(_i, acc):
            return jnp.float32(fn(a + acc * 1e-12)) * 1e-12

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    _ = float(rep(x))
    t0 = time.perf_counter()
    _ = float(rep(x))
    dt = (time.perf_counter() - t0) / R
    print(f"{name:10s} {dt*1e3:8.1f} ms/scene")
    return dt


def bench_rg():
    from plumekit.identify.rg import _statics

    cfg = RGIdentifyConfig()
    sub = subset_fires_to_image(lat, lon, scene.fires, date,
                                min_frp=cfg.min_frp)
    clusters = mean_cluster_positions(sub, cfg.cluster_dist_km)
    rows, cols = locate_fires_in_image(
        clusters.latitude, clusters.longitude, lat, lon, cfg.win_half)
    fr, fc, fv = pad_fires(rows, cols, cfg.max_fires, bucket=True)
    fr_j, fc_j, fv_j = jnp.asarray(fr), jnp.asarray(fc), jnp.asarray(fv)
    th = jnp.asarray(np.asarray(cfg.thresholds, np.float32))
    fn = cached_sweep_identifier(_statics(cfg))

    def run(a):
        out = fn(a, a, nulls, th, fr_j, fc_j, fv_j)
        return (jnp.sum(out["extents"]).astype(jnp.float32)
                + jnp.sum(out["accepted"]))

    chain_time("rg", run, aod_j)


def bench_gaussian():
    from plumekit.identify.gaussian import (_statics,
                                            cluster_fire_centroids,
                                            load_fires)

    cfg = GaussianIdentifyConfig()
    rows, cols = load_fires(lat, lon, scene.fires, date, cfg)
    cr, cc, cvalid = cluster_fire_centroids(aod.shape, rows, cols, cfg)
    fn = cached_sweep_identifier(_statics(cfg))
    th_sets = [jnp.asarray(validate_descending_thresholds(t))
               for t in cfg.threshold_sets()]

    def run(a):
        a_i = nearest_fill(a, nulls)
        acc = jnp.float32(0)
        for th in th_sets:
            out = fn(a_i, a_i, nulls, th, cr, cc, cvalid)
            acc += (jnp.sum(out["extents"]).astype(jnp.float32)
                    + jnp.sum(out["accepted"]))
        return acc

    chain_time("gaussian", run, aod_j)


def bench_basic():
    from plumekit.identify.basic import _make_program

    cfg = BasicIdentifyConfig()
    sub = subset_fires_to_image(lat, lon, scene.fires, date)
    w = cfg.win_half
    # interior pre-filter mirrors identify()'s edge-clip semantics
    rows, cols = locate_fires_in_image(
        sub.latitude, sub.longitude, lat, lon, w)
    keep = ((rows >= w) & (rows < aod.shape[0] - w)
            & (cols >= w) & (cols < aod.shape[1] - w))
    fr, fc, fv = pad_fires(rows[keep], cols[keep], cfg.max_fires,
                           bucket=True)
    fr_j, fc_j, fv_j = jnp.asarray(fr), jnp.asarray(fc), jnp.asarray(fv)
    prog = _make_program(cfg)

    def run(a):
        out = prog(a, fr_j, fc_j, fv_j)
        return (jnp.sum(out["area"]).astype(jnp.float32)
                + jnp.sum(out["plume"]))

    chain_time("basic", run, aod_j)


benches = {"rg": bench_rg, "gaussian": bench_gaussian,
           "basic": bench_basic}
for key in args.detectors.split(","):
    benches[key.strip()]()
