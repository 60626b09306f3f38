#!/usr/bin/env python
"""Config-5 streaming benchmark (VERDICT round-2 item 8): serial
decode→infer vs prefetch-only vs decode-pool streaming on 6×1152² granules,
plus a host→device transfer bandwidth probe (the suspected relay ceiling).

Usage: python experiments/streaming_bench.py [--cpu] [--n 6] [--size 1152]
"""

import os as _os
import sys as _sys

# repo-root import shim: these scripts are run as
# `python experiments/<name>.py`, where sys.path[0] is experiments/
# and plumekit is not pip-installed on every host (round-3 capture
# failed on exactly this)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os
import tempfile
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--n", type=int, default=6)
p.add_argument("--size", type=int, default=1152)
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plumekit.config.train import InferConfig, TrainConfig, UNetConfig
from plumekit.infer import make_sliding_infer
from plumekit.infer.streaming import decode_granule_channels, stream_inference
from plumekit.io.granule import Granule, save_granule
from plumekit.models import UNet
from plumekit.train.state import create_state

print(f"backend: {jax.default_backend()}  {args.n}x{args.size}²")

# --- transfer bandwidth probe (fresh arrays each rep: dedup-proof) ---
rng = np.random.default_rng(0)
mb = 16
for rep in range(3):
    arr = rng.random((mb * 1024 * 1024 // 4,), np.float32)
    t0 = time.perf_counter()
    d = jax.device_put(arr)
    _ = float(d[-1])
    dt = time.perf_counter() - t0
    print(f"device_put {mb} MB: {dt*1e3:8.1f} ms  -> {mb/dt:8.1f} MB/s")

# --- build granules on disk ---
tmp = tempfile.mkdtemp(prefix="pk_stream_")
paths = []
for i in range(args.n):
    aod = rng.random((args.size, args.size)).astype(np.float32)
    lat, lon = np.mgrid[0:args.size, 0:args.size].astype(np.float64)
    g = Granule(layers={"t0": aod}, lat=lat, lon=lon, name=f"g{i}")
    path = os.path.join(tmp, f"g{i}.npz")
    save_granule(path, g)
    paths.append(path)

unet_cfg = UNetConfig()
state = create_state(jax.random.PRNGKey(0), unet_cfg, TrainConfig())
variables = {"params": state.params}
if state.batch_stats is not None:
    variables["batch_stats"] = state.batch_stats
model = UNet(unet_cfg)
infer = make_sliding_infer(
    model.apply, InferConfig(tile_size=288, overlap=32, batch_tiles=16),
    channels=unet_cfg.in_channels,
)

# warm the compile on one granule
name, ch, hw = decode_granule_channels(paths[0], unet_cfg.depth)
probs, _ = infer(variables, jnp.asarray(ch))
_ = float(probs.ravel()[0])

px = args.n * args.size**2


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{label:44s} {dt:7.2f} s  {px/dt/1e6:7.2f} MPix/s")
    return dt


def serial():
    for path in paths:
        _n, ch, (h, w) = decode_granule_channels(path, unet_cfg.depth)
        probs, _ = infer(variables, jnp.asarray(ch))
        _ = np.asarray(probs)[:h, :w]


def streamed(workers, quantize=False, batch_granules=1,
             quantize_output=False):
    for _name, probs in stream_inference(paths, infer, variables,
                                         unet_cfg.depth,
                                         decode_workers=workers,
                                         quantize=quantize,
                                         batch_granules=batch_granules,
                                         quantize_output=quantize_output):
        pass


# warm EVERY timed program variant out of the timing: plain single-granule,
# quantised single-granule, and the G=3 grouped program each lower to a
# distinct jit program (a G=2-only warm-up left dt_q/dt_qb paying their
# first compiles inside the timed region)
for _ in stream_inference(paths[:1], infer, variables, unet_cfg.depth):
    pass
for _ in stream_inference(paths[:1], infer, variables, unet_cfg.depth,
                          quantize=True):
    pass
for _ in stream_inference(paths[:3], infer, variables, unet_cfg.depth,
                          quantize=True, batch_granules=3):
    pass
if len(paths) % 3:
    # ragged tail: a run whose n is not a multiple of 3 ends dt_qb with a
    # (n % 3)-granule group — a DISTINCT vmapped program that would
    # otherwise pay its first compile inside the timed region
    for _ in stream_inference(paths[: len(paths) % 3], infer, variables,
                              unet_cfg.depth, quantize=True,
                              batch_granules=3):
        pass

dt_serial = timed("serial decode->infer", serial)
dt_p1 = timed("prefetch only (1 decode thread)", lambda: streamed(1))
dt_p4 = timed("decode pool (4 threads) + prefetch", lambda: streamed(4))
# round-3 levers: uint16 payloads (halve the 16-20 MB/s relay transfer)
# and granule grouping (amortise the per-program dispatch tax)
dt_q = timed("prefetch + uint16 payloads", lambda: streamed(1, True))
dt_qb = timed("prefetch + uint16 + batch_granules=3",
              lambda: streamed(1, True, 3))
# round-3 output lever: uint8 prob readback (the downlink is the bigger
# half of the measured transfer budget); warm its program variants first
for _ in stream_inference(paths[:1], infer, variables, unet_cfg.depth,
                          quantize_output=True):
    pass
for _ in stream_inference(paths[:3], infer, variables, unet_cfg.depth,
                          quantize=True, quantize_output=True,
                          batch_granules=3):
    pass
if len(paths) % 3:
    for _ in stream_inference(paths[: len(paths) % 3], infer, variables,
                              unet_cfg.depth, quantize=True,
                              quantize_output=True, batch_granules=3):
        pass
dt_qo = timed("prefetch + uint8 prob readback",
              lambda: streamed(1, quantize_output=True))
dt_all = timed("prefetch + uint16 + uint8 out + batch=3",
               lambda: streamed(1, True, 3, True))
print(f"\nspeedup vs serial: prefetch {dt_serial/dt_p1:.2f}x  "
      f"pool {dt_serial/dt_p4:.2f}x  quant {dt_serial/dt_q:.2f}x  "
      f"quant+batch {dt_serial/dt_qb:.2f}x  quant_out {dt_serial/dt_qo:.2f}x  "
      f"all {dt_serial/dt_all:.2f}x")
