"""Serving-geometry autotuner (``plumekit tune``).

The shipped :class:`~plumekit.config.train.InferConfig` defaults are the
optima MEASURED on this project's tunneled v5e (BASELINE.md round-3
sweeps: overlap-blend 288/32 with 64-tile batches at G=4 granules per
program; fast tiling 256/0). But the optimum is a property of the
attached hardware, not of the model: the relay's fixed per-program
dispatch tax rewards large amortised programs, HBM capacity caps
``granules × batch_tiles × tile²`` (the measured G=8 @ 8192² OOM), and a
direct-attached chip or a different TPU generation shifts all of it. A
production deployment should re-measure on its own chips instead of
trusting numbers measured through a tunnel.

``tune_geometry`` runs that sweep: each candidate geometry is built into
the real serving program (:func:`make_sliding_infer` /
:func:`make_multi_granule_infer` — the same code ``predict_model`` and
``serve`` dispatch) and timed under bench.py's discipline — all repeats
chained inside ONE jitted ``fori_loop`` (per-dispatch latency and
dispatch dedup never pollute the sample; each iteration's input is
perturbed by the previous output so the chain serialises) with
completion forced by a scalar host readback. Candidates that fail to
compile or exceed device memory are recorded as failures and ranked
last, so an aggressive grid is safe to sweep. ``save_tuned`` persists
the ranked table; ``predict_model --tuned`` / ``serve --tuned`` then
serve the winner.

The reference has no analogue (it ships no benchmarks and a fixed
serial loop, ``plume_identifier_rg.py:537-576``); this subsystem exists
because plumekit's throughput levers are measured, per-platform knobs.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

#: default artifact name under ``<root>/models/``
TUNED_BASENAME = "tuned_geometry.json"
TUNED_VERSION = 1


@dataclass(frozen=True)
class Geometry:
    """One candidate serving geometry: the four measured throughput knobs."""

    tile: int           #: sliding-window tile size (px)
    overlap: int        #: blended overlap (0 = disjoint fast tiling)
    batch_tiles: int    #: tiles per device forward
    granules: int       #: granules per dispatched program (G)

    def label(self) -> str:
        return (f"{self.tile}/{self.overlap} "
                f"bt={self.batch_tiles} G={self.granules}")


#: the grid the BASELINE.md round-3 sweeps explored, minus the configs
#: that OOM'd everywhere (batch_tiles 256). Overlap-blend and fast-tiling
#: candidates both appear so the tuner reports the blend tax on THIS
#: hardware; picking between them is still a quality decision (the ~0.07%
#: seam flips, docs/performance.md), which is why ``best_blended`` is
#: reported alongside the overall ``best``.
DEFAULT_CANDIDATES = "288/32,256/0,384/32,512/0,288/32/128,256/0/128"


def parse_candidates(spec: str,
                     granules: Sequence[int] = (1,)) -> List[Geometry]:
    """Parse ``tile/overlap[/batch_tiles]`` comma-list × granule counts.

    Raises ValueError on malformed fields or overlap ≥ tile (the same
    stride guard :func:`make_sliding_infer` enforces, surfaced early)."""
    geoms: List[Geometry] = []
    for part in spec.split(","):
        fields = part.strip().split("/")
        if len(fields) not in (2, 3):
            raise ValueError(
                f"candidate {part!r}: expected tile/overlap[/batch_tiles]")
        tile, overlap = int(fields[0]), int(fields[1])
        bt = int(fields[2]) if len(fields) == 3 else 64
        if not 0 <= overlap < tile:
            raise ValueError(
                f"candidate {part!r}: overlap must be in [0, tile) — "
                "negative overlaps leave unscored gap stripes")
        if tile < 1 or bt < 1:
            raise ValueError(f"candidate {part!r}: sizes must be >= 1")
        for g in granules:
            if g < 1:
                raise ValueError(f"granules-per-program {g} must be >= 1")
            geoms.append(Geometry(tile, overlap, bt, g))
    if not geoms:
        raise ValueError("no candidate geometries given")
    return geoms


def time_geometry(apply_fn: Callable, variables, image_stack, geom: Geometry,
                  channels: int, repeats: int = 3) -> float:
    """MPix/s of the full serving program at one geometry.

    ``image_stack`` is a pre-staged ``(G_max, S, S, C)`` device array —
    staged ONCE by the caller so candidate timing excludes host→device
    transfer (the tuner measures the program, not the link; config-5
    streaming owns the transfer budget)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from plumekit.config.train import InferConfig
    from plumekit.infer.sliding import (make_multi_granule_infer,
                                        make_sliding_infer)

    icfg = InferConfig(tile_size=geom.tile, overlap=geom.overlap,
                       batch_tiles=geom.batch_tiles)
    if geom.granules > 1:
        minfer = make_multi_granule_infer(apply_fn, icfg, channels=channels)
        image = image_stack[: geom.granules]

        def one(variables, img):
            probs, _ = minfer(variables, img)
            return probs.mean()
    else:
        sinfer = make_sliding_infer(apply_fn, icfg, channels=channels)
        image = image_stack[0]

        def one(variables, img):
            probs, _ = sinfer(variables, img)
            return probs.mean()

    def repeated(variables, img):
        def body(_i, acc):
            # chain iteration i's input on iteration i-1's output: the
            # relay dedups identical dispatches and block_until_ready
            # does not synchronize, so an unchained loop measures nothing
            return one(variables, img + acc * 1e-12)

        return lax.fori_loop(0, repeats, body, jnp.float32(0))

    rep = jax.jit(repeated)
    float(rep(variables, image))                 # compile + warm-up
    t0 = time.perf_counter()
    float(rep(variables, image))                 # scalar readback = sync
    dt = time.perf_counter() - t0
    size = image_stack.shape[1] * image_stack.shape[2]
    return size * geom.granules * repeats / dt / 1e6


def tune_geometry(apply_fn: Callable, variables, channels: int,
                  granule: int, geoms: Sequence[Geometry],
                  repeats: int = 3,
                  progress: Optional[Callable[[str], None]] = None) -> dict:
    """Sweep ``geoms`` on the attached device; return the ranked payload.

    Every candidate is attempted; compile/memory failures are recorded
    (``mpix_s: null`` + the error) and ranked last. Raises RuntimeError
    only if EVERY candidate fails."""
    import jax
    import jax.numpy as jnp

    say = progress or (lambda msg: logger.info("%s", msg))
    g_max = max(g.granules for g in geoms)
    rng = np.random.default_rng(0)
    # host-side base stack; each candidate stages ONLY its G granules and
    # frees them after timing — a resident max-G stack would pressure (or
    # OOM) the smaller candidates it shares HBM with, and staging must sit
    # INSIDE the per-candidate try so an oversized G records as a failure
    # instead of aborting the sweep
    host_stack = rng.random((g_max, granule, granule, channels), np.float32)
    results = []
    for geom in geoms:
        image_stack = None
        try:
            image_stack = jnp.asarray(host_stack[: geom.granules])
            rate = time_geometry(apply_fn, variables, image_stack, geom,
                                 channels, repeats)
            results.append({**dataclasses.asdict(geom),
                            "mpix_s": round(rate, 2)})
            say(f"{geom.label()}: {rate:.1f} MPix/s")
        except Exception as e:  # OOM / compile failure: rank last, keep going
            results.append({**dataclasses.asdict(geom), "mpix_s": None,
                            "error": f"{type(e).__name__}: {e}"})
            say(f"{geom.label()}: FAILED ({type(e).__name__})")
        finally:
            if image_stack is not None:
                image_stack.delete()
    ranked = sorted(results,
                    key=lambda r: -(r["mpix_s"] if r["mpix_s"] else 0.0))
    if ranked[0]["mpix_s"] is None:
        raise RuntimeError(
            "every candidate geometry failed; first error: "
            + ranked[0]["error"])
    blended = [r for r in ranked if r["overlap"] > 0 and r["mpix_s"]]
    dev = jax.devices()[0]
    return {
        "version": TUNED_VERSION,
        "granule": granule,
        "channels": channels,
        "repeats": repeats,
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "best": ranked[0],
        # the fastest overlap>0 candidate: operators who need config-3's
        # seam-free blend semantics pick this one (fast tiling trades
        # ~0.07% seam mask flips for its rate — a quality call the tuner
        # must not make silently)
        "best_blended": blended[0] if blended else None,
        "results": ranked,
    }


def save_tuned(path: str, payload: dict) -> None:
    """Atomic write (pid-suffixed tmp + ``os.replace``): a concurrent
    serve restart must never read a torn artifact, and two concurrent
    tuners must not share a tmp name (a fixed name lets writer B publish
    while writer A still holds the fd and corrupts the live file)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)


def load_tuned(path: str) -> dict:
    """Load + validate a tuned-geometry artifact; raises ValueError with
    an actionable message on version/shape mismatch."""
    with open(path) as f:
        payload = json.load(f)
    if payload.get("version") != TUNED_VERSION:
        raise ValueError(
            f"{path}: tuned-geometry version {payload.get('version')!r} "
            f"!= supported {TUNED_VERSION} — re-run `plumekit tune`")
    best = payload.get("best") or {}
    for key in ("tile", "overlap", "batch_tiles", "granules"):
        if not isinstance(best.get(key), int):
            raise ValueError(
                f"{path}: malformed 'best' entry (missing {key}) — "
                f"re-run `plumekit tune`")
    return payload
