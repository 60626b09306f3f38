#!/usr/bin/env python
"""Diagnose the 4096² percolation level (level 16 of the production
threshold set): sweep counts of the XLA label-propagation loop with and
without full per-pixel pointer jumping, on CPU.

If full jumping converges in ~15 sweeps, the kernel's sparse jumps are
too weak (densify). If even full jumping needs ~60, convergence is
discovery-bound and no jump variant can beat the sweeps — stop trying.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--size", type=int, default=4096)
p.add_argument("--level", type=int, default=16)
args = p.parse_args()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")

import jax.numpy as jnp
from jax import lax

from plumekit.config.identify import RGIdentifyConfig
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.ops.ccl import _SENTINEL, _sweep
from plumekit.ops.morphology import binary_opening_cross

cfg = RGIdentifyConfig()
scene = make_scene(SyntheticSceneConfig(
    size=args.size, n_plumes=9, seed=0, background_level=0.2,
    background_noise=0.05, plume_amplitude=(0.6, 0.8),
    plume_sigma_major=(9.0, 14.0), plume_sigma_minor=(1.8, 2.6),
    fires_per_plume=(7, 9), extra_fires=4))
aod = scene.granule.first_layer()
ths = np.asarray(cfg.thresholds, np.float32)
print("thresholds:", ths)

# warm-start labels from the previous (tighter) level, like the sweep
prev_mask = jnp.asarray(aod > ths[args.level - 1])
mask = jnp.asarray(aod > ths[args.level])
prev_mask = binary_opening_cross(prev_mask)
mask = binary_opening_cross(mask)
fg = float(jnp.mean(mask))
print(f"level {args.level} fg fraction: {fg:.3f} "
      f"(prev {float(jnp.mean(prev_mask)):.3f})")

h, w = mask.shape
ids = (lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
       + lax.broadcasted_iota(jnp.int32, (h, w), 1))


def run(hops: int, init):
    @jax.jit
    def count(init, mask):
        def cond(s):
            _, ch, it = s
            return ch & (it < 1024)

        def body(s):
            lbl, _, it = s
            new = _sweep(lbl, mask, 2)
            flat = new.reshape(-1)
            for _ in range(hops):
                hopped = flat[jnp.clip(flat, 0, h * w - 1)]
                flat = jnp.where(flat == _SENTINEL, _SENTINEL, hopped)
            new = flat.reshape(h, w)
            return new, jnp.any(new != lbl), it + 1

        _, _, n = lax.while_loop(cond, body,
                                 (init, jnp.bool_(True), jnp.int32(0)))
        return n

    n = int(count(init, mask))
    print(f"hops={hops}: {n} sweeps")
    return n


# previous level's converged labels as warm start (hops=2 to get them fast)
from plumekit.ops.ccl import connected_components

prev_lbl = connected_components(prev_mask, connectivity=2)
seeded = jnp.where(prev_lbl > 0, prev_lbl - 1, ids)
init = jnp.where(mask, seeded, _SENTINEL)
cold = jnp.where(mask, ids, _SENTINEL)

print("warm-started (the kernel's regime):")
run(0, init)
run(2, init)
print("cold:")
run(0, cold)
run(2, cold)
