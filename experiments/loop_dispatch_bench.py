#!/usr/bin/env python
"""Production train-loop dispatch amortisation (round 3).

`experiments/train_bench.py` measures the in-one-jit step rate; the
production loop previously dispatched one program per optimizer step, so
the platform's fixed ~45 ms dispatch latency rode on every step. This
times the REAL `train()` loop end-to-end at steps_per_dispatch K ∈
{1, 4, 10}: same data, same keys, same logging cadence — the difference
is purely how many steps each dispatched program carries.

Usage: python experiments/loop_dispatch_bench.py [--steps 120]
           [--geometry 16x128] [--cpu]
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

p = argparse.ArgumentParser()
p.add_argument("--steps", type=int, default=120)
p.add_argument("--geometry", default="16x128",
               help="batchxtile (the quality-loop geometry by default)")
p.add_argument("--ks", default="1,4,10")
p.add_argument("--quantize", action="store_true",
               help="also time each K with quantize_transfer (uint16/uint8 "
                    "uploads, on-device dequant)")
p.add_argument("--device-data", action="store_true",
               help="also time each K with the HBM-resident dataset "
                    "(tiles drawn inside the scanned program; zero per-"
                    "step upload)")
p.add_argument("--modes", default=None,
               help="explicit comma list from fp32,quant,dev,devq "
                    "(overrides the flag-derived mode set; skipping the "
                    "fp32 legs matters at big K — their chunked uploads "
                    "are transfer-bound and their scanned programs cost "
                    "minutes of remote compile each)")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache" if not args.cpu
                  else "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plumekit.config.train import DataConfig, TrainConfig, UNetConfig
from plumekit.train.loop import train

batch, tile = (int(v) for v in args.geometry.split("x"))
print(f"backend: {jax.default_backend()}  geometry: {batch}x{tile}²  "
      f"steps: {args.steps}")

data_cfg = DataConfig(granule_size=max(tile * 2, 256), n_train_granules=2,
                      n_eval_granules=1)


import logging


class _RateTap(logging.Handler):
    """Capture the loop's own per-interval MPix/s log values — the steady
    rate after compile/first-dispatch, vs the wall rate that includes data
    gen + final eval."""

    def __init__(self):
        super().__init__()
        self.rates = []

    def emit(self, record):
        if record.msg.startswith("step %d loss"):
            self.rates.append(float(record.args[-1]))


def run(k: int, quantize: bool = False, device_data: bool = False):
    cfg = TrainConfig(total_steps=args.steps, batch_size=batch,
                      tile_size=tile, log_every=args.steps // 2,
                      eval_every=0, steps_per_dispatch=k,
                      quantize_transfer=quantize, device_data=device_data)
    tap = _RateTap()
    logging.getLogger("plumekit.train.loop").addHandler(tap)
    try:
        t0 = time.perf_counter()
        train(unet_cfg=UNetConfig(), train_cfg=cfg, data_cfg=data_cfg,
              checkpoint=False)
        return time.perf_counter() - t0, tap.rates
    finally:
        logging.getLogger("plumekit.train.loop").removeHandler(tap)


px = batch * tile * tile * args.steps
ALL_MODES = {"fp32": ("fp32 ", {}),
             "quant": ("quant", {"quantize": True}),
             "dev": ("dev  ", {"device_data": True}),
             "devq": ("dev+q", {"device_data": True, "quantize": True})}
if args.modes:
    modes = [ALL_MODES[m] for m in args.modes.split(",") if m]
else:
    modes = [ALL_MODES["fp32"]]
    if args.quantize:
        modes.append(ALL_MODES["quant"])
    if args.device_data:
        modes.append(ALL_MODES["dev"])
        modes.append(ALL_MODES["devq"])
for k in (int(v) for v in args.ks.split(",")):
    for tag, kw in modes:
        _ = run(k, **kw)             # compile + warm (persistent cache)
        dt, rates = run(k, **kw)
        steady = max(rates[1:] or rates) if rates else float("nan")
        print(f"K={k:3d} {tag}  {dt:6.2f} s wall  {px / dt / 1e6:6.1f} "
              f"MPix/s wall  {steady:6.1f} MPix/s steady")
