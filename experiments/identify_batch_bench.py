#!/usr/bin/env python
"""Single-chip multi-scene identify amortisation (round 3).

The inference headline gained 1.6-1.9x from putting G granules through ONE
dispatched program (BASELINE.md round-3 row) because a fixed per-program
dispatch tax rides on every call through the tunneled runtime. The identify
sweep pays the same tax: 72 ms/scene at 1200² (round 2) includes it. This
bench runs G scenes per program — ``lax.map`` over the scene axis, the
same structure ``identify/batch.py`` runs per device shard — and reports
ms/scene vs G, under the platform timing discipline (repeats chained
inside one jit, scalar-readback sync).

Usage: python experiments/identify_batch_bench.py [--size 1200]
           [--batches 1,2,4,8] [--repeats 3] [--cpu]
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
p.add_argument("--batches", default="1,2,4,8")
p.add_argument("--repeats", type=int, default=3)
p.add_argument("--cpu", action="store_true")
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
from plumekit.identify.pipeline import cached_sweep_identifier
from plumekit.identify.rg import _statics
from plumekit.io.fires import subset_fires_to_image
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.ops.cluster import mean_cluster_positions

R = args.repeats
GS = [int(g) for g in args.batches.split(",")]
print(f"backend: {jax.default_backend()}  size: {args.size}  repeats: {R}")

cfg = RGIdentifyConfig()
fn = cached_sweep_identifier(_statics(cfg))
th_j = jnp.asarray(np.asarray(cfg.thresholds, np.float32))

# distinct scenes (different seeds) so per-scene work varies like a real
# granule batch rather than G copies of one scene
scenes = []
for seed in range(max(GS)):
    scene = make_scene(SyntheticSceneConfig(
        size=args.size, n_plumes=9, seed=seed,
        background_level=0.2, background_noise=0.05,
        plume_amplitude=(0.6, 0.8), plume_sigma_major=(9.0, 14.0),
        plume_sigma_minor=(1.8, 2.6), fires_per_plume=(7, 9), extra_fires=4,
    ))
    aod = scene.granule.first_layer()
    date = scene.fires.date_time.iloc[0]
    sub = subset_fires_to_image(scene.granule.lat, scene.granule.lon,
                                scene.fires, date, min_frp=cfg.min_frp)
    clusters = mean_cluster_positions(sub, cfg.cluster_dist_km)
    rows, cols = locate_fires_in_image(clusters.latitude, clusters.longitude,
                                       scene.granule.lat, scene.granule.lon,
                                       cfg.win_half)
    fr, fc, fv = pad_fires(rows, cols, cfg.max_fires)
    scenes.append((aod, fr, fc, fv, len(rows)))
print("fire clusters/scene:", [s[4] for s in scenes])

for G in GS:
    aods = jnp.asarray(np.stack([s[0] for s in scenes[:G]]), jnp.float32)
    frs = jnp.asarray(np.stack([s[1] for s in scenes[:G]]))
    fcs = jnp.asarray(np.stack([s[2] for s in scenes[:G]]))
    fvs = jnp.asarray(np.stack([s[3] for s in scenes[:G]]))
    nulls = jnp.zeros(aods.shape, bool)

    def program(aod_stack):
        def one(xs):
            aod, null, r, c, v = xs
            out = fn(aod, aod, null, th_j, r, c, v)
            return (jnp.sum(out["extents"]).astype(jnp.float32)
                    + jnp.sum(out["accepted"]))

        # lax.map: scenes run sequentially INSIDE one program (a vmapped
        # while_loop would make every scene pay the slowest sweep count);
        # the per-program dispatch tax is paid once for all G
        return jnp.sum(lax.map(one, (aod_stack, nulls, frs, fcs, fvs)))

    def repeated(aod_stack):
        def body(_i, acc):
            return acc * 1e-12 + program(aod_stack + acc * 1e-12)

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    _ = float(rep(aods))                     # compile + warm
    t0 = time.perf_counter()
    _ = float(rep(aods))
    dt = (time.perf_counter() - t0) / (R * G)
    print(f"G={G:2d}  {dt*1e3:8.1f} ms/scene  "
          f"({G/( (time.perf_counter()-t0)/R ):5.1f} scenes/s/program-step)")
