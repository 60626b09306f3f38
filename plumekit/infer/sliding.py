"""Full-granule sliding-window inference with on-device overlap-blend
stitching (BASELINE.json config 3).

The reference's promised ``predict_model`` never existed; its per-tile
inference becomes: tile the granule with overlapping windows, run the U-Net
on tile batches (a scan of a vmapped forward — static shapes, single
compilation), weight each tile with a separable linear taper over the
overlap region, and accumulate the probability canvas with sequential
``dynamic_update_slice`` adds (a single big scatter-add was measured 1.5×
slower — TPU scatters are expensive); the weight canvas is a trace-time
constant of the static grid. The result is deterministic and seam-free.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from plumekit.config.train import InferConfig


def _taper(tile: int, overlap: int) -> np.ndarray:
    """1-D weight: linear ramp over the overlap, flat 1 in the core. Ramp
    endpoints are strictly positive so fully-covered pixels never divide by
    zero. For deep overlaps (> tile/2) the two ramps meet — combining with
    ``minimum`` keeps the profile monotone up-then-down (a plain second
    assignment would leave a discontinuity and blend seams)."""
    w = np.ones(tile, np.float32)
    if overlap > 0:
        ramp = (np.arange(1, overlap + 1, dtype=np.float32)) / (overlap + 1)
        w[:overlap] = np.minimum(w[:overlap], ramp)
        w[-overlap:] = np.minimum(w[-overlap:], ramp[::-1])
    return w


def _effective_batch(batch_tiles: int, n: int) -> int:
    """Per-forward batch for an ``n``-tile grid: the size in
    [batch_tiles/2, batch_tiles] that minimises duplicate batch-fill tiles
    (ties to the largest batch). The naive ``min(batch_tiles, n)`` wastes
    whole forwards whenever the grid count sits just past a multiple —
    e.g. the 29×29 = 841-tile grid of an 8192² granule at 256-px stride
    pads 183 duplicates at batch 256 (+22% forward FLOPs) while batch 211
    pads 3 (+0.4%); the waste was the measured gap between the 288²-tile
    apply rate and the 288/0 pipeline rate (BASELINE.md round-3 tile
    sweep). The search is O(batch_tiles) numpy at trace time; halving is
    the floor because very small batches under-fill the device."""
    hi = max(1, min(batch_tiles, n))
    best, best_pad = hi, (-n) % hi
    for eff in range(hi - 1, max(0, hi // 2 - 1), -1):
        p = (-n) % eff
        if p < best_pad:
            best, best_pad = eff, p
            if p == 0:
                break
    return best


def tile_grid(size: int, tile: int, stride: int) -> np.ndarray:
    """Start offsets covering [0, size) with the last tile clamped flush."""
    if size <= tile:
        return np.zeros((1,), np.int32)
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return np.asarray(starts, np.int32)


def make_sliding_infer(
    apply_fn: Callable,
    cfg: InferConfig = InferConfig(),
    channels: int = 2,
):
    """Build ``infer(variables, image (H, W, C)) -> (probs (H, W), mask)``,
    jitted per image shape. ``apply_fn(variables, batch, train=False)`` must
    return (B, t, t, 1) logits.

    Stitching has two paths. Whenever overlap ≤ stride and the image is at
    least one tile, the image is edge-padded onto the stride lattice and
    the canvas is assembled from the four tile parity classes (even/odd
    grid row × col): tiles within a class are disjoint on the canvas
    (pitch 2·stride ≥ tile), so each class is one pad→transpose→reshape
    embed — ~27 ops total instead of 3 ops *per tile*. On the tunneled TPU
    each executed op costs ~45 µs of dispatch, so this is the difference
    between stitching being free and stitching rivalling the forward pass.
    NOTE a deliberate semantic change vs the round-1 clamped grid: the last
    row/col of tiles now read edge-REPLICATED pixels beyond the true image
    instead of a clamped flush tile of real data, so predictions within one
    overlap band of the bottom/right edges can differ slightly (the same
    replication `pad_to_multiple` already applies upstream). Deep overlaps
    (> stride) and sub-tile images keep the sequential
    dynamic_update_slice scan (a single big scatter-add measured 1.5×
    slower)."""
    tile = cfg.tile_size
    stride = tile - cfg.overlap
    if cfg.emit not in ("float", "uint8"):
        raise ValueError(f"emit must be 'float' or 'uint8', got {cfg.emit!r}")
    emit_u8 = cfg.emit == "uint8"
    # mask rule in the uint8 domain: p8 > ⌊t·255⌋ ⟺ p > t within the
    # 1/510 codec band (same contract as the streaming readback codec)
    thresh_u8 = int(np.floor(cfg.threshold * 255.0))
    if stride < 1:
        raise ValueError(
            f"overlap ({cfg.overlap}) must be smaller than tile_size "
            f"({tile}): the sliding stride would be {stride}")
    if cfg.overlap < 0:
        # stride > tile leaves uncovered stripes whose weight canvas is 0
        # → probs silently 0 there; and the geometry times FASTER than any
        # valid one, so a tuner sweep would rank it best
        raise ValueError(
            f"overlap must be >= 0, got {cfg.overlap}: a negative overlap "
            "leaves gap stripes between tiles that would be silently "
            "scored 0")

    def _grid_and_weights(h, w, count_padding: bool):
        """Static per-shape geometry: origins (batch-padded), weight-canvas
        factors, and counts. ``count_padding`` adds the duplicate batch-fill
        tiles to the weight canvas (the general path also adds their probs;
        the fast path drops them before assembly).

        The weight canvas is SEPARABLE: the grid is a cross product of row
        and column starts, so sum_tiles taper(y-oy)·taper(x-ox) =
        (sum_i taper(y-oy_i)) · (sum_j taper(x-ox_j)); the batch-fill
        duplicates all repeat the last origin, adding one rank-1 term. An
        (H, W) canvas constant would be baked into the HLO and blow the
        remote-compile request past its size limit at large granules
        (256 MB at 8192² — observed HTTP 413), so only the 1-D factors are
        trace-time constants and the outer product runs on device."""
        ys_np = tile_grid(h, tile, stride)
        xs_np = tile_grid(w, tile, stride)
        yy, xx = np.meshgrid(ys_np, xs_np, indexing="ij")
        origins_np = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
        n = origins_np.shape[0]
        # effective batch clamps to the real tile count: a small granule's
        # grid (e.g. 16 tiles at 1024²) must not pad up to a large
        # batch_tiles default and waste 4x the forward on duplicates —
        # the geometry is static per image shape, so this is free
        eff = _effective_batch(cfg.batch_tiles, n)
        pad = (-n) % eff
        padded = np.concatenate(
            [origins_np, np.tile(origins_np[-1:], (pad, 1))], axis=0
        )
        taper_np = _taper(tile, cfg.overlap)
        weight2d_np = taper_np[:, None] * taper_np[None, :]

        def axis_weight(starts, size):
            acc = np.zeros(size, np.float32)
            for s in starts:
                acc[s : s + tile] += taper_np
            return acc

        wy_np, wx_np = axis_weight(ys_np, h), axis_weight(xs_np, w)

        def inv_weight_canvas(hh, ww):
            canvas = jnp.outer(jnp.asarray(wy_np[:hh]),
                               jnp.asarray(wx_np[:ww]))
            if count_padding and pad:
                ty = np.zeros(h, np.float32)
                ty[ys_np[-1] : ys_np[-1] + tile] = taper_np
                tx = np.zeros(w, np.float32)
                tx[xs_np[-1] : xs_np[-1] + tile] = taper_np
                canvas = canvas + pad * jnp.outer(
                    jnp.asarray(ty[:hh]), jnp.asarray(tx[:ww]))
            return 1.0 / jnp.maximum(canvas, 1e-8)

        return (len(ys_np), len(xs_np), n, eff, padded, weight2d_np,
                inv_weight_canvas)

    @partial(jax.jit, static_argnames=())
    def infer(variables, image):
        h, w = image.shape[0], image.shape[1]
        ph, pw = max(0, tile - h), max(0, tile - w)
        if ph or pw:
            # sub-tile image: edge-pad up to one tile (the same replication
            # pad_to_multiple applies upstream), infer, crop back
            padded = jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
            probs, mask = infer(variables, padded)
            return probs[:h, :w], mask[:h, :w]

        def _finish(probs):
            """Blend/general-path epilogue: fp32 accumulation is already
            done; with emit="uint8" the RESULT encodes to the readback
            codec so the returned canvas (and any host readback) is
            1 byte/px."""
            if emit_u8:
                from plumekit.ops.quant import quantize_probs_uint8

                p8 = quantize_probs_uint8(probs)
                return p8, p8 > jnp.uint8(thresh_u8)
            return probs, probs > cfg.threshold

        def forward_batch(image, batch_origins, as_u8: bool = False):
            tiles = jax.vmap(
                lambda o: lax.dynamic_slice(
                    image, (o[0], o[1], 0), (tile, tile, channels)
                )
            )(batch_origins)
            logits = apply_fn(variables, tiles, train=False)
            probs = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
            if as_u8:
                # encode INSIDE the forward epilogue (fuses with the
                # sigmoid): scan outputs, canvas, and result drop to
                # 1 byte/px for the whole post-forward pipeline
                from plumekit.ops.quant import quantize_probs_uint8

                return quantize_probs_uint8(probs)
            return probs

        # ---- regular-grid fast path: pad the image (edge mode) so every
        # tile sits on the stride lattice, run all forwards, then assemble
        # the canvas from the four tile parity classes — tiles of one class
        # are disjoint (pitch 2·stride ≥ tile), so each class embeds with a
        # single pad→transpose→reshape instead of 3 ops per tile. On the
        # tunneled TPU each executed op costs ~45 µs of dispatch; this makes
        # stitching ~27 ops regardless of tile count (VERDICT round-2 #4).
        if tile <= 2 * stride and h >= tile and w >= tile:
            h2 = tile + -(-(h - tile) // stride) * stride
            w2 = tile + -(-(w - tile) // stride) * stride
            ny, nx, n, eff, padded_origins, weight2d_np, make_inv = \
                _grid_and_weights(h2, w2, count_padding=False)
            img = jnp.pad(image, ((0, h2 - h), (0, w2 - w), (0, 0)),
                          mode="edge")
            origins = jnp.asarray(padded_origins).reshape(-1, eff, 2)
            fast_u8 = emit_u8 and cfg.overlap == 0
            _, probs_all = lax.scan(
                lambda c, o: (c, forward_batch(img, o, as_u8=fast_u8)),
                0, origins
            )
            probs_all = probs_all.reshape(-1, tile, tile)[:n]
            if cfg.overlap == 0:
                # fast tiling: stride == tile makes the taper identically 1
                # (weight and inverse-weight canvases are exact ones — both
                # multiplies drop out bit-for-bit) and every tile disjoint,
                # so the whole assembly is ONE transpose+reshape instead of
                # four padded parity-class embeds + adds — removes ~10
                # canvas-sized HBM passes per granule at the 256/0 serving
                # config
                canvas = probs_all.reshape(ny, nx, tile, tile) \
                    .transpose(0, 2, 1, 3).reshape(ny * tile, nx * tile)
                probs = canvas[:h, :w]
                if fast_u8:
                    return probs, probs > jnp.uint8(thresh_u8)
                return probs, probs > cfg.threshold
            weight2d = jnp.asarray(weight2d_np)
            inv_weight = make_inv(h, w)
            probs_all = probs_all.reshape(ny, nx, tile, tile) * weight2d
            pitch = 2 * stride
            canvas = jnp.zeros((h2 + pitch, w2 + pitch), jnp.float32)
            for pr in (0, 1):
                for pc in (0, 1):
                    if pr >= ny or pc >= nx:
                        continue
                    cls = probs_all[pr::2, pc::2]
                    gy, gx = cls.shape[0], cls.shape[1]
                    cls = jnp.pad(
                        cls,
                        ((0, 0), (0, 0), (0, pitch - tile),
                         (0, pitch - tile)),
                    )
                    sheet = cls.transpose(0, 2, 1, 3).reshape(
                        gy * pitch, gx * pitch
                    )
                    off_y, off_x = pr * stride, pc * stride
                    sheet = jnp.pad(
                        sheet,
                        ((off_y, h2 + pitch - off_y - gy * pitch),
                         (off_x, w2 + pitch - off_x - gx * pitch)),
                    )
                    canvas = canvas + sheet
            probs = canvas[:h, :w] * inv_weight
            return _finish(probs)

        # ---- general path: clamped grids / tiny images / deep overlap ----
        ny, nx, n, eff, padded_origins, weight2d_np, make_inv = \
            _grid_and_weights(h, w, count_padding=True)
        weight2d = jnp.asarray(weight2d_np)
        inv_weight = make_inv(h, w)
        origins = jnp.asarray(padded_origins).reshape(-1, eff, 2)

        def run_batch(prob_canvas, batch_origins):
            probs = forward_batch(image, batch_origins)

            def add_one(prob_c, args):
                o, p = args
                cur = lax.dynamic_slice(prob_c, (o[0], o[1]), (tile, tile))
                return lax.dynamic_update_slice(
                    prob_c, cur + p * weight2d, (o[0], o[1])
                ), None

            # sequential adds inside the batch: overlapping tiles of the same
            # batch must not race on canvas regions
            prob_canvas, _ = lax.scan(add_one, prob_canvas,
                                      (batch_origins, probs))
            return prob_canvas, None

        prob_canvas, _ = lax.scan(run_batch, jnp.zeros((h, w), jnp.float32),
                                  origins)
        probs = prob_canvas * inv_weight
        return _finish(probs)

    return infer


def make_multi_granule_infer(
    apply_fn: Callable,
    cfg: InferConfig = InferConfig(),
    channels: int = 2,
):
    """Build ``infer(variables, images (G, H, W, C)) -> (probs (G, H, W),
    masks)`` — G granules' whole tile grids in ONE dispatched program.

    On the tunneled platform every executed HLO op costs ~45 µs of
    dispatch, so a fixed per-program tax rides on each single-granule call
    (VERDICT round-2 weak #3). vmapping the sliding infer over a granule
    axis keeps the op COUNT of one granule while every op now carries G
    granules of work — the tile forwards become one (G·B, t, t, C) batch,
    the parity-class stitching assembles G canvases with the same ~27 ops.
    Amortisation is strongest where dispatch dominates (small granules:
    48.6 MPix/s at 1024² single vs >100 at 2048² in round 2)."""
    single = make_sliding_infer(apply_fn, cfg, channels)
    return jax.jit(jax.vmap(single, in_axes=(None, 0)))


def make_batch_infer_sharded(
    apply_fn: Callable,
    mesh,
    cfg: InferConfig = InferConfig(),
    channels: int = 2,
    axis: str = "data",
):
    """Build ``infer(variables, images (D·G, H, W, C)) -> (probs, masks)``
    — BASELINE.json config 5's pod-slice shape: the granule stack shards
    over the mesh's ``axis`` and every device runs its local G granules'
    tile grids in ONE program (the vmapped multi-granule formulation).

    Two-level batching composes the framework's two throughput levers:
    data parallelism across chips (no collectives — granules are
    independent) and per-chip dispatch amortisation (BASELINE.md round 3:
    108 → 230 MPix/s/chip at G=4). The leading dim must divide by the
    axis size; params replicate."""
    from jax.sharding import PartitionSpec as P

    from plumekit.parallel.compat import shard_map

    single = make_sliding_infer(apply_fn, cfg, channels)
    local = jax.vmap(single, in_axes=(None, 0))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis)), out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(fn)


def pad_to_multiple(image: np.ndarray, multiple: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Edge-pad H/W up to a multiple (U-Net needs 2**depth divisibility for
    arbitrary granules); returns (padded, original (H, W))."""
    h, w = image.shape[:2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        image = np.pad(image, ((0, ph), (0, pw)) + ((0, 0),) * (image.ndim - 2),
                       mode="edge")
    return image, (h, w)
