#!/usr/bin/env python
"""Cost of the pointer-jump primitive (a flat label gather lbl[lbl]) at
swath scale — the round-5 feasibility probe for the log-depth CCL hybrid.

The XLA CCL path (`ops/ccl.py`) pointer-jumps percolation masks from 216
to 18 sweeps at 1200²; whether the same trick pays inside a swath-scale
hybrid depends entirely on what a 16.7M-element random gather costs on
this chip. Measures, under the chained one-jit discipline:

  * flat[flat] gather at 1200², 2048², 4096², (8192² if it fits)
  * the same with 2 chained hops (the ops/ccl.py default)
  * a full down+up Pallas sweep at 4096² for scale (via max_sweeps=1)

Usage: python experiments/gather_probe.py [--cpu]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--repeats", type=int, default=5)
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

R = args.repeats
print(f"backend: {jax.default_backend()}  repeats: {R}")


def chain_time(label, program, x):
    def repeated(x):
        def body(_i, acc):
            return program(x, acc)

        return lax.fori_loop(0, R, body, jnp.float32(0))

    rep = jax.jit(repeated)
    _ = float(rep(x))
    t0 = time.perf_counter()
    _ = float(rep(x))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:48s} {dt*1e3:9.2f} ms")
    return dt


for size in (1200, 2048, 4096, 8192):
    n = size * size
    rng = np.random.default_rng(0)
    # label-like contents: mostly self/small ids with long-range pointers
    flat = rng.integers(0, n, n).astype(np.int32)
    x = jnp.asarray(flat)

    def hop1(x, acc):
        idx = (x + acc.astype(jnp.int32)) % n
        return x[idx].astype(jnp.float32).sum() * 1e-12

    def hop2(x, acc):
        idx = (x + acc.astype(jnp.int32)) % n
        y = x[idx]
        return x[jnp.clip(y, 0, n - 1)].astype(jnp.float32).sum() * 1e-12

    chain_time(f"{size}^2 gather x1", hop1, x)
    chain_time(f"{size}^2 gather x2", hop2, x)
