#!/usr/bin/env python
"""Swath-scale CCL convergence probe (round-5 queue #1).

Measures the bare multi-threshold CCL kernel at a given scene size with
the PRODUCTION threshold set (the near-percolation regime that needed
>64 Gauss-Seidel passes in round 4: 668.6 ms at 4096²), comparing:

  * worklist kernel, local_iters=1  (round-5 default)
  * worklist kernel, local_iters=2  (within-visit direction alternation)
  * per-level pass counts (return_stats) — the convergence diagnostic

plus an on-chip parity check of the worklist kernel against the XLA
scan path at a reduced size (the full TPU gate is tests/test_tpu_only.py).

Usage: python experiments/ccl_worklist_probe.py [--size 4096] [--cpu]
       [--parity] [--stats] [--iters 1 2]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--size", type=int, default=4096)
p.add_argument("--repeats", type=int, default=3)
p.add_argument("--iters", type=int, nargs="*", default=[1])
p.add_argument("--jump-start", type=int, default=8)
p.add_argument("--jump-every", type=int, default=4)
p.add_argument("--jump-hops", type=int, default=2)
p.add_argument("--jump-rstride", type=int, default=128)
p.add_argument("--jump-cstride", type=int, default=128)
p.add_argument("--stats", action="store_true")
p.add_argument("--parity", action="store_true")
p.add_argument("--banded", action="store_true", help="time/verify the HBM-banded fused-mask kernel")
p.add_argument("--fused", action="store_true", help="time/verify the VMEM-resident fused-mask kernel")
p.add_argument("--lean", action="store_true", help="lean row scans (one per visit)")
p.add_argument("--skip-base", action="store_true", help="skip the opened-stack kernel timing")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from plumekit.utils.backend import probe_backend

    probe_backend()
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from plumekit.config.identify import RGIdentifyConfig
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.ops.morphology import binary_opening_cross
from plumekit.ops.pallas.ccl_sweep import multi_threshold_ccl

cfg = RGIdentifyConfig()
R = args.repeats
print(f"backend: {jax.default_backend()}  size: {args.size}  "
      f"T: {len(cfg.thresholds)}")

scene = make_scene(SyntheticSceneConfig(
    size=args.size, n_plumes=9, seed=0, background_level=0.2,
    background_noise=0.05, plume_amplitude=(0.6, 0.8),
    plume_sigma_major=(9.0, 14.0), plume_sigma_minor=(1.8, 2.6),
    fires_per_plume=(7, 9), extra_fires=4))
aod_j = jnp.asarray(scene.granule.first_layer(), jnp.float32)
th = jnp.asarray(np.asarray(cfg.thresholds, np.float32))


@jax.jit
def opened_of(a):
    masks = a[None, :, :] > th[:, None, None]
    return binary_opening_cross(masks)


def chain_time(name, fn):
    def repeated(a):
        def body(_i, acc):
            return jnp.float32(fn(a + acc * 1e-12)) * 1e-12

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    t0 = time.perf_counter()
    _ = float(rep(aod_j))
    print(f"{name:28s} compile+warm {time.perf_counter()-t0:7.1f} s",
          flush=True)
    t0 = time.perf_counter()
    _ = float(rep(aod_j))
    dt = (time.perf_counter() - t0) / R
    print(f"{name:28s} {dt*1e3:9.1f} ms/scene", flush=True)
    return dt


if args.stats:
    @jax.jit
    def with_stats(a):
        _, s = multi_threshold_ccl(opened_of(a), connectivity=2,
                                   jump_start=args.jump_start,
                                   jump_every=args.jump_every,
                                   jump_hops=args.jump_hops,
                                   jump_rstride=args.jump_rstride,
                                   jump_cstride=args.jump_cstride,
                                   return_stats=True)
        return s

    s = np.asarray(with_stats(aod_j))
    print("per-level down+up pass counts (tightest→loosest):")
    print("  ", list(map(int, s)), f" total={int(s.sum())}", flush=True)

if args.skip_base:
    args.iters = []

if args.fused:
    from plumekit.ops.pallas.ccl_sweep import multi_threshold_ccl_fused

    def fusedp(a):
        labels = multi_threshold_ccl_fused(a, th, connectivity=2,
                                           lean_scans=args.lean)
        return jnp.sum(labels[:, ::37, ::37].astype(jnp.float32))

    chain_time("fused resident CCL", fusedp)

    if args.parity:
        sz = min(args.size, 1200)
        a = aod_j[:sz, :sz]
        got_f = np.asarray(multi_threshold_ccl_fused(a, th, connectivity=2))
        res_k = np.asarray(multi_threshold_ccl(opened_of(a), connectivity=2))
        assert (got_f == res_k).all(), "fused != opened-stack kernel"
        print(f"fused parity at {sz}²: == opened-stack kernel", flush=True)

for li in args.iters:
    def bare(a, li=li):
        labels = multi_threshold_ccl(opened_of(a), connectivity=2,
                                     local_iters=li,
                                     jump_start=args.jump_start,
                                     jump_every=args.jump_every,
                                     jump_hops=args.jump_hops,
                                     jump_rstride=args.jump_rstride,
                                     jump_cstride=args.jump_cstride)
        return jnp.sum(labels[:, ::37, ::37].astype(jnp.float32))

    chain_time(f"bare CCL local_iters={li}", bare)

if args.banded:
    from plumekit.ops.pallas.ccl_banded import multi_threshold_ccl_banded

    if args.stats:
        @jax.jit
        def bstats(a):
            _, s = multi_threshold_ccl_banded(a, th, connectivity=2,
                                              return_stats=True)
            return s

        s = np.asarray(bstats(aod_j))
        print("banded per-level pass counts:")
        print("  ", list(map(int, s)), f" total={int(s.sum())}", flush=True)

    def banded(a):
        labels = multi_threshold_ccl_banded(a, th, connectivity=2)
        return jnp.sum(labels[:, ::37, ::37].astype(jnp.float32))

    chain_time("banded fused CCL", banded)

    if args.parity:
        sz = min(args.size, 1200)
        a = aod_j[:sz, :sz]
        got_b = np.asarray(multi_threshold_ccl_banded(a, th,
                                                      connectivity=2))
        res_k = np.asarray(multi_threshold_ccl(opened_of(a),
                                               connectivity=2))
        assert (got_b == res_k).all(), "banded != resident kernel"
        print(f"banded parity at {sz}²: == resident kernel", flush=True)

if args.parity and not args.banded:
    from plumekit.ops.ccl import connected_components

    sz = min(args.size, 1200)
    a = aod_j[:sz, :sz]
    opened = opened_of(a)
    got = np.asarray(multi_threshold_ccl(opened, connectivity=2))
    for li in [2]:
        alt = np.asarray(multi_threshold_ccl(opened, connectivity=2,
                                             local_iters=li))
        assert (alt == got).all(), f"local_iters={li} diverged"

    def label_one(prev, m):
        lbl = connected_components(m, connectivity=2, init_labels=prev)
        return lbl, lbl

    _, ref = jax.lax.scan(label_one, jnp.zeros(a.shape, jnp.int32),
                          opened)
    ref = np.asarray(ref)
    assert (got == ref).all(), "kernel != XLA scan path"
    print(f"parity at {sz}²: kernel == XLA scan, local_iters variants "
          "bit-equal", flush=True)
