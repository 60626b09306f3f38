#!/usr/bin/env python
"""plumekit benchmark — full-granule sliding-window U-Net inference
(BASELINE.json config 3, the headline metric: segmentation MPix/s/chip).

The default forward is the shipped int8 production serving path (see the
INT8 flag below; PLUMEKIT_BENCH_INT8=0 measures the bf16 forward, the
number comparable to rounds 1-2). The metric name carries the forward.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MPix/s/chip", "vs_baseline": N}

``vs_baseline`` is measured against a same-architecture torch-CPU U-Net
forward (the reference stack is torch-era CPU Python; it ships no benchmarks
— BASELINE.md — so the baseline is measured here, not cited).
"""

import json
import os
import sys
import time

import numpy as np

# granule size: fixed per-call costs amortize with pixels (57-62 MPix/s at
# 1024², 108 at 2048², 132 at 4096² for G=1); tile 288 / overlap 32 keeps
# batches full (1.27x overlap redundancy, no batch padding).
# batch_tiles 64 = a whole 2048² grid in ONE forward: 77 -> 100.6 MPix/s
# measured (fewer dispatched programs; round-2 op-count lever)
GRANULE = int(os.environ.get("PLUMEKIT_BENCH_GRANULE", "8192"))
TILE = int(os.environ.get("PLUMEKIT_BENCH_TILE", "288"))
# overlap 32 = config 3's overlap-blend semantics (the honest default).
# TILE=256 OVERLAP=0 is the measured fast-tiling mode: 414.2 MPix/s int8 /
# 293.9 bf16 at the default granule config (the stitching redundancy
# removed + the single-reshape canvas assembly) at a measured ~0.07% seam
# mask-flip cost (docs/performance.md round-3 sweep + assembly follow-up)
OVERLAP = int(os.environ.get("PLUMEKIT_BENCH_OVERLAP", "32"))
BATCH_TILES = int(os.environ.get("PLUMEKIT_BENCH_BATCH_TILES", "64"))
REPEATS = int(os.environ.get("PLUMEKIT_BENCH_REPEATS", "3"))
# G granules per dispatched program (vmapped sliding infer): amortises the
# relay's fixed per-program/per-op dispatch tax across granules
# (VERDICT round-2 weak #3); G=1 is the round-2 single-granule protocol.
# Measured round 3 at 2048²: G=1 108.3, G=2 185.0, G=4 208.9, G=6 208.3,
# G=8 200.1 MPix/s; at 4096²: G=1 132.3, G=2 217.1; at 8192² (unlocked by
# the separable-weight-canvas fix — an (H,W) HLO constant previously blew
# the remote-compile request limit): G=1 139.1, G=2 223.7, G=4 230.4
# (peak), G=6 221.5, G=8 errors on memory; 16384² single 141.1 — default
# to the measured optimum, 4 swath-scale granules per program
GRANULES = int(os.environ.get("PLUMEKIT_BENCH_GRANULES", "4"))
# int8 post-training-quantized serving is the DEFAULT headline forward:
# it is the shipped production configuration (predict_model --int8 /
# export_model --int8), its quality is measured quality-free (GT-dev IoU
# 0.7042 int8 vs 0.7030 fp32, 0.026% mask flips — BASELINE.md), and with
# the custom_vmap batch-fold fix it runs 324.8 MPix/s/chip vs 230.5 bf16
# on the default 4x8192² config. PLUMEKIT_BENCH_INT8=0 restores the bf16
# forward (the round-1/2-comparable number); the metric name carries the
# forward so rounds are never silently conflated.
INT8 = os.environ.get("PLUMEKIT_BENCH_INT8", "1") == "1"
# PLUMEKIT_BENCH_ARCH=unetpp[:ds[:pL]] serves the UNet++ family instead
# (":ds" adds deep supervision — the measured quality pick, BASELINE.md
# round-3 architecture ladder; ":p2" serves the grid pruned at fusion
# column 2, the paper's speed/quality dial — see predict_model
# --prune-level); the metric name carries it. The U-Net default is the
# cross-round-comparable headline.
ARCH = os.environ.get("PLUMEKIT_BENCH_ARCH", "unet")
# model capacity (round-4 distillation capacity sweep serves non-default
# students); defaults are the flagship base 32 / depth 4
BASE = int(os.environ.get("PLUMEKIT_BENCH_BASE", "32"))
DEPTH = int(os.environ.get("PLUMEKIT_BENCH_DEPTH", "4"))
# PLUMEKIT_BENCH_EMIT=uint8 runs the serving epilogue in the readback-codec
# domain (InferConfig.emit): scan outputs, canvas assembly, threshold and
# the returned plane at 1 byte/px instead of 4 (VERDICT round-3 weak #2)
EMIT = os.environ.get("PLUMEKIT_BENCH_EMIT", "float")
# secondary menu measurements appended to the JSON line (VERDICT round-3
# #9): fast-tiling, pruned-L1, train-step and identify rates — so
# non-headline regressions surface round-over-round. PLUMEKIT_BENCH_
# SECONDARY=0 restores the headline-only run; each entry degrades to null
# on its own failure instead of killing the line
SECONDARY = os.environ.get("PLUMEKIT_BENCH_SECONDARY", "1") == "1"


# set by main() when the TPU probe fails: the split-cache discipline
# (CLAUDE.md) says never share the remote compiler's AOT cache with host
# CPU compiles
CACHE_DIR = ".jax_cache"


def _setup_cache():
    import jax

    if CACHE_DIR:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         CACHE_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_tpu(granule=None, granules=None, tile=None, overlap=None,
              batch_tiles=None, arch=None, int8=None, emit=None,
              repeats=None, base=None, depth=None) -> float:
    """Chained-timing throughput of one serving configuration; every
    parameter defaults to the env-driven headline config."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    granule = GRANULE if granule is None else granule
    granules = GRANULES if granules is None else granules
    tile = TILE if tile is None else tile
    overlap = OVERLAP if overlap is None else overlap
    batch_tiles = BATCH_TILES if batch_tiles is None else batch_tiles
    arch = ARCH if arch is None else arch
    int8 = INT8 if int8 is None else int8
    emit = EMIT if emit is None else emit
    repeats = REPEATS if repeats is None else repeats

    _setup_cache()

    from plumekit.config.train import InferConfig, TrainConfig, UNetConfig
    from plumekit.infer import make_sliding_infer
    from plumekit.models import build_model
    from plumekit.train.state import create_state

    base = BASE if base is None else base
    depth = DEPTH if depth is None else depth
    parts = arch.split(":")
    prune = next((int(t[1:]) for t in parts[1:] if t.startswith("p")), None)
    unet_cfg = UNetConfig(arch=parts[0],
                          deep_supervision="ds" in parts[1:],
                          prune_level=prune,
                          base_features=base, depth=depth)
    # base 32, depth 4, bf16 compute
    state = create_state(jax.random.PRNGKey(0), unet_cfg,
                         TrainConfig(tile_size=tile))
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    model = build_model(unet_cfg)
    # Default is the XLA path: the Pallas kernel wins 2x per-level at deep
    # channels but the current layer-by-layer integration loses it back to
    # pad/crop traffic between kernels (fused double-conv kernel keeping the
    # flattened layout across taps is the round-2 lever; see BASELINE.md).
    if os.environ.get("PLUMEKIT_BENCH_FUSED", "0") == "1" and int8:
        raise RuntimeError(
            "PLUMEKIT_BENCH_FUSED and PLUMEKIT_BENCH_INT8 are mutually "
            "exclusive forward paths — set PLUMEKIT_BENCH_INT8=0 for the "
            "fused-bf16 capture (int8 is the default forward)")
    if os.environ.get("PLUMEKIT_BENCH_FUSED", "0") == "1":
        # Pallas fused conv+BN+ReLU at the deep levels (see
        # plumekit/models/pallas/fused_conv.py), XLA elsewhere
        from plumekit.models.fused_forward import make_fused_apply

        apply_fn = make_fused_apply(unet_cfg)
    elif int8:
        # int8 post-training-quantized forward: all convs on the MXU
        # s8×s8→s32 path (2× the bf16 rate on v5e) — the compute-ceiling
        # lever for the dispatch-amortised program (models/
        # quantized_forward.py; mask-parity tested on CPU)
        from plumekit.models.quantized_forward import (
            make_quantized_apply, quantize_unet)

        calib = jnp.asarray(
            np.random.default_rng(1).random((4, tile, tile,
                                             unet_cfg.in_channels),
                                            np.float32))
        variables = quantize_unet(variables, unet_cfg, calib)
        apply_fn = make_quantized_apply(unet_cfg)
    else:
        apply_fn = model.apply
    icfg = InferConfig(tile_size=tile, overlap=overlap,
                       batch_tiles=batch_tiles, emit=emit)
    if granules > 1:
        from plumekit.infer.sliding import make_multi_granule_infer

        minfer = make_multi_granule_infer(apply_fn, icfg,
                                          channels=unet_cfg.in_channels)

        def infer(variables, image):
            probs, masks = minfer(variables, image)
            return probs.mean(axis=0), masks[0]
    else:
        infer = make_sliding_infer(apply_fn, icfg,
                                   channels=unet_cfg.in_channels)

    rng = np.random.default_rng(0)
    shape = ((granule, granule, unet_cfg.in_channels) if granules == 1
             else (granules, granule, granule, unet_cfg.in_channels))
    image = jnp.asarray(rng.random(shape, np.float32))
    # timing discipline for the tunneled TPU platform: per-dispatch latency
    # is ~45 ms, block_until_ready does not synchronize, and identical
    # dispatches get deduped — so all repeats run INSIDE one jit program,
    # each iteration's input perturbed by the previous output (serialising
    # the chain), and completion is forced by a scalar host readback.
    def repeated(variables, image):
        def body(_i, acc):
            probs, _ = infer(variables, image + acc * 1e-12)
            # uint8 canvases still sync through a scalar readback; the
            # mean feeds the chain as a float either way
            return probs.astype(jnp.float32).mean()

        return lax.fori_loop(0, repeats, body, jnp.float32(0))

    rep = jax.jit(repeated)
    _ = float(rep(variables, image))             # compile + warm-up
    t0 = time.perf_counter()
    _ = float(rep(variables, image))             # host readback = sync
    dt = time.perf_counter() - t0
    return granule * granule * granules * repeats / dt / 1e6


def bench_train_step() -> float:
    """Steady-interval production train-step rate (MPix/s) at the
    16×128² quality-loop geometry: the device-resident-data loop
    (train_model --device-data) at K=10 steps/dispatch — the round-4
    shipped fast-loop config."""
    import logging

    from plumekit.config.train import DataConfig, TrainConfig, UNetConfig
    from plumekit.train.loop import train

    _setup_cache()
    rates = []

    class Tap(logging.Handler):
        def emit(self, record):
            if record.msg.startswith("step %d loss"):
                rates.append(float(record.args[-1]))

    tap = Tap()
    logging.getLogger("plumekit.train.loop").addHandler(tap)
    try:
        train(unet_cfg=UNetConfig(),
              train_cfg=TrainConfig(total_steps=120, batch_size=16,
                                    tile_size=128, log_every=40,
                                    eval_every=0, steps_per_dispatch=10,
                                    device_data=True),
              data_cfg=DataConfig(granule_size=256, n_train_granules=2,
                                  n_eval_granules=1),
              checkpoint=False)
    finally:
        logging.getLogger("plumekit.train.loop").removeHandler(tap)
    # first interval carries compile; steady = best of the rest
    return max(rates[1:] or rates)


def bench_identify_ms() -> float:
    """Device rg identify sweep, ms per 1200² scene (the round-2/3
    identify protocol at G=1), chained timing."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    _setup_cache()

    from plumekit.config.identify import RGIdentifyConfig
    from plumekit.identify.locate import locate_fires_in_image, pad_fires
    from plumekit.identify.pipeline import cached_sweep_identifier
    from plumekit.identify.rg import _statics
    from plumekit.io.fires import subset_fires_to_image
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
    from plumekit.ops.cluster import mean_cluster_positions

    cfg = RGIdentifyConfig()
    fn = cached_sweep_identifier(_statics(cfg))
    th_j = jnp.asarray(np.asarray(cfg.thresholds, np.float32))
    scene = make_scene(SyntheticSceneConfig(
        size=1200, n_plumes=9, seed=0, background_level=0.2,
        background_noise=0.05, plume_amplitude=(0.6, 0.8),
        plume_sigma_major=(9.0, 14.0), plume_sigma_minor=(1.8, 2.6),
        fires_per_plume=(7, 9), extra_fires=4))
    aod = scene.granule.first_layer()
    date = scene.fires.date_time.iloc[0]
    sub = subset_fires_to_image(scene.granule.lat, scene.granule.lon,
                                scene.fires, date, min_frp=cfg.min_frp)
    clusters = mean_cluster_positions(sub, cfg.cluster_dist_km)
    rows, cols = locate_fires_in_image(
        clusters.latitude, clusters.longitude,
        scene.granule.lat, scene.granule.lon, cfg.win_half)
    fr, fc, fv = pad_fires(rows, cols, cfg.max_fires, bucket=True)
    aod_j = jnp.asarray(aod, jnp.float32)
    nulls = jnp.zeros(aod.shape, bool)
    reps = 3

    def repeated(aod_j):
        def body(_i, acc):
            out = fn(aod_j + acc * 1e-12, aod_j, nulls, th_j,
                     jnp.asarray(fr), jnp.asarray(fc), jnp.asarray(fv))
            return (jnp.sum(out["extents"]).astype(jnp.float32)
                    + jnp.sum(out["accepted"])) * 1e-12

        return lax.fori_loop(0, reps, body, jnp.float32(0))

    rep = jax.jit(repeated)
    _ = float(rep(aod_j))
    t0 = time.perf_counter()
    _ = float(rep(aod_j))
    return (time.perf_counter() - t0) / reps * 1e3


def bench_torch_cpu() -> float:
    """Same U-Net (32-base, depth-4, batchnorm) in torch CPU eval —
    per-pixel forward throughput on TILE² tiles."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 1)

    def double(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
        )

    class TorchUNet(nn.Module):
        def __init__(self, cin=2, base=32, depth=4):
            super().__init__()
            self.downs = nn.ModuleList()
            f = base
            c = cin
            for _ in range(depth):
                self.downs.append(double(c, f))
                c, f = f, f * 2
            self.bottleneck = double(c, f)
            self.ups = nn.ModuleList()
            self.upconvs = nn.ModuleList()
            for _ in range(depth):
                self.upconvs.append(nn.ConvTranspose2d(f, f // 2, 2, 2))
                self.ups.append(double(f, f // 2))
                f //= 2
            self.head = nn.Conv2d(f, 1, 1)
            self.pool = nn.MaxPool2d(2)

        def forward(self, x):
            skips = []
            for d in self.downs:
                x = d(x)
                skips.append(x)
                x = self.pool(x)
            x = self.bottleneck(x)
            for up, dc, skip in zip(self.upconvs, self.ups,
                                    reversed(skips)):
                x = up(x)
                x = dc(torch.cat([skip, x], dim=1))
            return self.head(x)

    model = TorchUNet().eval()
    x = torch.rand(1, 2, TILE, TILE)
    with torch.no_grad():
        model(x)  # warm-up
        best = float("inf")
        for _ in range(3):  # best-of-3: robust to transient host load
            t0 = time.perf_counter()
            model(x)
            best = min(best, time.perf_counter() - t0)
    return TILE * TILE / best / 1e6


def _probe_backend(attempts: int = 4, probe_timeout: int = 180,
                   backoff: int = 120) -> None:
    """Bounded SUBPROCESS probe of the TPU backend before committing this
    process to it (canonical implementation:
    :func:`plumekit.utils.backend.probe_backend` — shared with
    `plumekit tune` and the experiment harnesses)."""
    from plumekit.utils.backend import probe_backend

    probe_backend(attempts, probe_timeout, backoff)


def _mfu_leg(mpix_s, arch=None, base=None, depth=None, tile=None,
             overlap=None, int8=None, train=False):
    """Apparent TFLOPS / %-of-peak for one measured leg (VERDICT round-4
    #5): canvas rate × analytic model FLOPs/px × tile-grid redundancy,
    against the v5e peak of the leg's matmul dtype. Train steps count
    fwd+bwd ≈ 3× forward FLOPs (the standard accounting)."""
    from plumekit.config.train import UNetConfig
    from plumekit.models.flops import (mfu, model_flops_per_pixel,
                                       sliding_redundancy)

    if mpix_s is None:
        return None
    arch = ARCH if arch is None else arch
    int8 = INT8 if int8 is None else int8
    parts = arch.split(":")
    prune = next((int(t[1:]) for t in parts[1:] if t.startswith("p")), None)
    cfg = UNetConfig(arch=parts[0], deep_supervision="ds" in parts[1:],
                     prune_level=prune,
                     base_features=BASE if base is None else base,
                     depth=DEPTH if depth is None else depth)
    fpp = model_flops_per_pixel(cfg) * (3.0 if train else 1.0)
    red = 1.0 if train else sliding_redundancy(
        GRANULE, TILE if tile is None else tile,
        OVERLAP if overlap is None else overlap)
    return mfu(mpix_s, fpp, peak="int8" if int8 else "bf16",
               redundancy=red)


def main() -> int:
    global GRANULE, GRANULES, BATCH_TILES, REPEATS, CACHE_DIR
    backend_note = ""
    try:
        _probe_backend()
    except RuntimeError as e:
        # the tunneled backend can be down for hours (round-3 outage);
        # the driver contract is ONE JSON line, so degrade to an HONEST
        # CPU measurement rather than printing nothing — the unit string
        # carries the caveat so the number can't be misread as a TPU rate
        print(f"{e}\nfalling back to the CPU backend at a small geometry "
              "so the driver still records a self-describing line",
              file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
        GRANULE, GRANULES, BATCH_TILES, REPEATS = 512, 1, 16, 1
        # no persistent cache here: the shared CPU cache holds AOT entries
        # whose machine features can mismatch this host (loader SIGILL
        # warnings observed) — a fresh 512² compile is cheap and safe
        CACHE_DIR = ""
        backend_note = (" [CPU FALLBACK at 512^2 - TPU tunnel down; "
                        "not comparable to TPU rounds]")
    # the tunneled backend occasionally drops a dispatch with a transient
    # FAILED_PRECONDITION (observed round 3: identical program succeeded on
    # immediate re-run) — one retry keeps a blip from zeroing the round.
    # Deterministic failures (OOM, compile errors) are NOT retried: on this
    # platform a full re-run costs minutes and buries the real traceback.
    _NO_RETRY = ("RESOURCE_EXHAUSTED", "out of memory", "Compilation failure",
                 "INVALID_ARGUMENT")
    try:
        value = bench_tpu()
    except Exception as e:
        if any(s.lower() in str(e).lower() for s in _NO_RETRY):
            raise
        print(f"bench attempt 1 failed ({e!r}); retrying once", file=sys.stderr)
        time.sleep(10)
        value = bench_tpu()
    try:
        baseline = bench_torch_cpu()
    except Exception as e:  # torch missing/broken must not kill the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline = float("nan")
    vs = value / baseline if baseline == baseline else float("nan")
    secondary = {}
    if SECONDARY and not backend_note:
        # the non-headline menu (VERDICT round-3 #9): each entry degrades
        # to null on its own failure so one bad path can't hide the rest
        menu = {
            "fast_tiling_mpix_s": lambda: bench_tpu(tile=256, overlap=0),
            "fast_uint8_mpix_s": lambda: bench_tpu(tile=256, overlap=0,
                                                   emit="uint8"),
            "pruned_l1_mpix_s": lambda: bench_tpu(tile=256, overlap=0,
                                                  arch="unetpp:ds:p1"),
            "train_step_mpix_s": bench_train_step,
            "identify_ms_scene": bench_identify_ms,
        }
        for key, fn in menu.items():
            try:
                secondary[key] = round(fn(), 2)
            except Exception as e:
                print(f"secondary {key} failed: {e!r}", file=sys.stderr)
                secondary[key] = None
    line = {
        "metric": (("unet" if ARCH == "unet" else
                    ARCH.replace(":", "_"))
                   + "_sliding_window_inference"
                   + ("_int8" if INT8 else "")
                   + ("_uint8emit" if EMIT == "uint8" else "")
                   + (f"_b{BASE}d{DEPTH}" if (BASE, DEPTH) != (32, 4)
                      else "")),
        "value": round(value, 2),
        "unit": "MPix/s/chip" + backend_note,
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }
    if secondary:
        line["secondary"] = secondary
    if not backend_note:
        # MFU panel (VERDICT round-4 #5): regressions read as %-of-peak,
        # not bare MPix/s; identify is excluded (not matmul-dominated)
        legs = {"headline": _mfu_leg(value)}
        if secondary:
            legs["fast_tiling"] = _mfu_leg(
                secondary.get("fast_tiling_mpix_s"), tile=256, overlap=0)
            legs["pruned_l1"] = _mfu_leg(
                secondary.get("pruned_l1_mpix_s"), arch="unetpp:ds:p1",
                tile=256, overlap=0)
            legs["train_step"] = _mfu_leg(
                secondary.get("train_step_mpix_s"), arch="unet", base=32,
                depth=4, int8=False, train=True)
        line["mfu"] = {k: v for k, v in legs.items() if v is not None}
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
