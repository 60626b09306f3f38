"""Device-resident training data: the whole training set lives in HBM and
tiles are drawn, dequantized, and augmented INSIDE the scanned step program.

The production loop was host→device transfer-bound on this platform
(BASELINE.md round 3: ~3.2 MB/batch over a ~40 MB/s relay ≈ 80 ms per step
vs a ~20 ms step; quantize-transfer shrank the payload 3× but kept the hop).
The 60-granule training protocol is ~90-190 MB — it fits in HBM whole
(v5e: 16 GB), so the TPU-native design uploads the granule stack ONCE and
deletes the per-step hop entirely: the K-step scanned program draws its own
plume-biased tiles with counter-based keys folded from the global step
index, augments on device (D4 was already device-side), and touches the
host only at log/eval/checkpoint boundaries.

Draw semantics mirror ``plumekit.train.data._draw_tile`` (uniform granule,
50% plume-centred ±8 px jitter, else uniform origin) with jax counter-based
RNG instead of the host ``numpy.Generator`` — the schedule is deterministic
in (seed, step) and resume-stable exactly like the multi-step path, and
:func:`draw_tile_batch` is a pure function so the in-program draws are
testable against an eager host evaluation of the same keys
(``tests/test_device_data.py``).

No reference analogue: the reference promised ``train_model.py`` but shipped
an empty ``src/models/`` (``/root/reference/README.md:41-45``).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from plumekit.train.state import TrainState


class DeviceDataset(NamedTuple):
    """The HBM-resident training set. A NamedTuple so it is a pytree and
    can be passed straight into jitted programs (never donated — it is
    reused by every dispatch of the run).

    Granules are edge-padded to at least one tile (matching
    ``_prep_samples``) then zero-padded to a common (H, W); ``heights`` /
    ``widths`` record each granule's valid extent so draws never enter the
    common-shape padding.
    """

    #: (N, H, W, C) float32 — or uint16 when quantized (see ``lo``)
    channels: jax.Array
    #: (N, H, W) float32 in [0, 1] — or uint8/255 when quantized
    masks: jax.Array
    #: (N, C) affine decode params when channels are uint16, else None
    lo: Optional[jax.Array]
    scale: Optional[jax.Array]
    #: (N, P) plume-pixel coordinates (padded with 0) + (N,) valid counts:
    #: the precomputed index the 50% plume-centred draws sample from
    plume_rows: jax.Array
    plume_cols: jax.Array
    plume_count: jax.Array
    #: (N,) valid (edge-padded) extents per granule
    heights: jax.Array
    widths: jax.Array


def build_device_dataset(samples: List, tile: int,
                         quantized: bool = False) -> DeviceDataset:
    """Assemble GranuleSamples into one HBM-ready stack (host numpy; the
    caller — or first jit call — moves it to device once).

    ``quantized`` stores channels as uint16 + per-granule affine params and
    masks as uint8/255 (the ``ops/quant`` codecs): 3× the granules per HBM
    byte, decoded per-tile after the slice (so only the live tiles are ever
    fp32). Exact for {0, 1} masks; soft distilled labels survive to 1/510;
    channel error ≤ range/131070 — below bf16 compute precision.
    """
    if not samples:
        raise ValueError("build_device_dataset got an empty sample list")
    padded = []
    for s in samples:
        ch, mask = s.channels, np.asarray(s.mask, np.float32)
        h, w = ch.shape[:2]
        if h < tile or w < tile:
            ph, pw = max(0, tile - h), max(0, tile - w)
            ch = np.pad(ch, ((0, ph), (0, pw), (0, 0)), mode="edge")
            mask = np.pad(mask, ((0, ph), (0, pw)))
        padded.append((ch.astype(np.float32), mask))
    hs = np.array([c.shape[0] for c, _ in padded], np.int32)
    ws = np.array([c.shape[1] for c, _ in padded], np.int32)
    H, W = int(hs.max()), int(ws.max())
    C = padded[0][0].shape[-1]
    n = len(padded)

    chan = np.zeros((n, H, W, C), np.float32)
    msk = np.zeros((n, H, W), np.float32)
    rows, cols = [], []
    for i, (c, m) in enumerate(padded):
        chan[i, : c.shape[0], : c.shape[1]] = c
        msk[i, : m.shape[0], : m.shape[1]] = m
        ys, xs = np.nonzero(m > 0.5)
        rows.append(ys)
        cols.append(xs)
    pmax = max(1, max(len(r) for r in rows))
    prow = np.zeros((n, pmax), np.int32)
    pcol = np.zeros((n, pmax), np.int32)
    pcnt = np.zeros((n,), np.int32)
    for i, (r, c) in enumerate(zip(rows, cols)):
        prow[i, : len(r)] = r
        pcol[i, : len(c)] = c
        pcnt[i] = len(r)

    lo = scale = None
    if quantized:
        from plumekit.ops.quant import quantize_uint16

        q = np.empty((n, H, W, C), np.uint16)
        lo = np.empty((n, C), np.float32)
        scale = np.empty((n, C), np.float32)
        for i in range(n):
            q[i], lo[i], scale[i] = quantize_uint16(chan[i])
        chan = q
        msk = np.rint(np.clip(msk, 0.0, 1.0) * 255.0).astype(np.uint8)

    return DeviceDataset(
        channels=jnp.asarray(chan), masks=jnp.asarray(msk),
        lo=None if lo is None else jnp.asarray(lo),
        scale=None if scale is None else jnp.asarray(scale),
        plume_rows=jnp.asarray(prow), plume_cols=jnp.asarray(pcol),
        plume_count=jnp.asarray(pcnt),
        heights=jnp.asarray(hs), widths=jnp.asarray(ws),
    )


def draw_tile_batch(ds: DeviceDataset, key: jax.Array, batch_size: int,
                    tile: int):
    """Pure-jnp plume-biased tile draw: ``key -> (xs (B, t, t, C) f32,
    ys (B, t, t, 1) f32)``. The device twin of ``data._draw_tile``:
    uniform granule; with prob 0.5 (and any plume pixels present) a
    plume-centred origin jittered ±8 px, else a uniform origin — all
    clipped to the granule's valid extent. Each batch slot consumes an
    independent split of ``key``, so the whole schedule is a function of
    the key alone (counter-based, resume-stable)."""
    C = ds.channels.shape[-1]

    def one(k):
        ks = jax.random.split(k, 7)
        i = jax.random.randint(ks[0], (), 0, ds.channels.shape[0])
        h, w = ds.heights[i], ds.widths[i]
        cnt = ds.plume_count[i]
        use_plume = (jax.random.uniform(ks[1]) < 0.5) & (cnt > 0)
        p = jax.random.randint(ks[2], (), 0, jnp.maximum(cnt, 1))
        jy = jax.random.randint(ks[3], (), -8, 9)
        jx = jax.random.randint(ks[4], (), -8, 9)
        cy_p = jnp.clip(ds.plume_rows[i, p] - tile // 2 + jy, 0, h - tile)
        cx_p = jnp.clip(ds.plume_cols[i, p] - tile // 2 + jx, 0, w - tile)
        cy_u = jax.random.randint(ks[5], (), 0, h - tile + 1)
        cx_u = jax.random.randint(ks[6], (), 0, w - tile + 1)
        cy = jnp.where(use_plume, cy_p, cy_u)
        cx = jnp.where(use_plume, cx_p, cx_u)
        xt = jax.lax.dynamic_slice(ds.channels, (i, cy, cx, 0),
                                   (1, tile, tile, C))[0]
        yt = jax.lax.dynamic_slice(ds.masks, (i, cy, cx),
                                   (1, tile, tile))[0]
        if ds.lo is not None:
            from plumekit.ops.quant import dequantize

            xt = dequantize(xt, ds.lo[i][None, None, :],
                            ds.scale[i][None, None, :])
            yt = yt.astype(jnp.float32) * (1.0 / 255.0)
        return xt, yt[..., None]

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)


def make_device_multi_step(dice_weight: float = 0.5, augment: bool = True,
                           mesh=None, label_smooth: float = 0.0,
                           base_rng=None, tile: int = 512,
                           batch_size: int = 16):
    """Returns ``multi(state, data: DeviceDataset, steps (K,)) -> (state,
    last_metrics)`` — K optimizer steps scanned inside ONE dispatched
    program with ZERO per-dispatch host payload beyond the (K,) step-index
    vector. Each scanned step folds the global index into ``base_rng``,
    splits draw/augment keys, draws its batch from the HBM-resident stack,
    and runs the shared step core.

    With a mesh the dataset is replicated and the drawn batch is
    sharding-constrained over ``data`` so GSPMD runs the fwd/bwd data-
    parallel (the draw itself is replicated scalar work). State is donated;
    the dataset is NOT (reused every dispatch).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from plumekit.train.step import _make_step_core

    core = _make_step_core(dice_weight, augment, label_smooth)
    if base_rng is None:
        base_rng = jax.random.PRNGKey(0)

    def multi(state: TrainState, data: DeviceDataset, steps):
        def body(st, s):
            k = jax.random.fold_in(base_rng, s)
            k_draw, k_aug = jax.random.split(k)
            xs, ys = draw_tile_batch(data, k_draw, batch_size, tile)
            if mesh is not None:
                sh = NamedSharding(mesh, P("data"))
                xs = jax.lax.with_sharding_constraint(xs, sh)
                ys = jax.lax.with_sharding_constraint(ys, sh)
            st, m = core(st, xs, ys, k_aug)
            return st, m

        state, ms = jax.lax.scan(body, state, steps)
        return state, jax.tree_util.tree_map(lambda a: a[-1], ms)

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        return jax.jit(
            multi,
            in_shardings=(replicated, replicated, replicated),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
    return jax.jit(multi, donate_argnums=(0,))


__all__ = ["DeviceDataset", "build_device_dataset", "draw_tile_batch",
           "make_device_multi_step"]
