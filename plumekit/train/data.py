"""Training data: tiles from (synthetic) granules with plume masks.

Fills the reference's promised-but-absent ``make_dataset`` /
``build_features`` roles (``README.md:32-39``): granules → multi-band tiles
(AOD + rasterised-fire channel) with labels from either ground truth
(synthetic) or the classical identify pipeline acting as weak labeller
(SURVEY.md §0 "consequence for the build").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np
from scipy import ndimage

from plumekit.config.train import DataConfig
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.io.granule import NULL_VALUE


@dataclass
class GranuleSample:
    """One scene ready for tiling: channels (H, W, C) float32, label mask
    (H, W) float32 in [0, 1] — hard {0, 1} from every labelling path,
    soft after offline distillation (``train/distill.py``) blends teacher
    probabilities in."""

    channels: np.ndarray
    mask: np.ndarray


def fire_channel(shape, rows, cols, sigma: float = 2.0) -> np.ndarray:
    """Rasterised fire detections smoothed to a density field — the second
    input band (BASELINE.json config 2: "AOD + active-fire" tiles)."""
    grid = np.zeros(shape, dtype=np.float32)
    if len(rows):
        grid[np.asarray(rows), np.asarray(cols)] = 1.0
        grid = ndimage.gaussian_filter(grid, sigma).astype(np.float32)
        m = grid.max()
        if m > 0:
            grid /= m
    return grid


def assemble_channels(aod: np.ndarray, rows, cols) -> np.ndarray:
    """THE model input contract: (H, W, 2) float32 of [AOD with nulls
    zeroed, normalised fire-density]. Every consumer (synthetic training,
    curated training, streaming inference) builds its channels here so the
    input bands can never silently diverge."""
    aod = aod.copy()
    aod[aod == NULL_VALUE] = 0.0
    fire = fire_channel(aod.shape, rows, cols)
    return np.stack([aod, fire], axis=-1).astype(np.float32)


def scene_to_sample(scene) -> GranuleSample:
    """Synthetic scene → (AOD, fire) channels + GT mask. Null pixels are
    zeroed in the AOD channel (the model sees physical AOD ∈ [0, ~2]).
    Fire-density normalisation happens inside ``assemble_channels``
    unconditionally (a dead ``normalize`` flag used to suggest otherwise)."""
    lat, lon = scene.granule.lat, scene.granule.lon
    # fire pixels from the fire table (nearest grid cell by construction)
    rows, cols = [], []
    for _, f in scene.fires.iterrows():
        d2 = (lat - f.latitude) ** 2 + (lon - f.longitude) ** 2
        idx = np.unravel_index(np.argmin(d2), lat.shape)
        rows.append(idx[0])
        cols.append(idx[1])
    channels = assemble_channels(scene.granule.first_layer(), rows, cols)
    return GranuleSample(channels=channels,
                         mask=scene.gt_mask.astype(np.float32))


def make_synthetic_dataset(cfg: DataConfig, train: bool = True
                           ) -> List[GranuleSample]:
    n = cfg.n_train_granules if train else cfg.n_eval_granules
    base = cfg.seed if train else cfg.seed + 10_000
    samples = []
    for i in range(n):
        scene = make_scene(
            SyntheticSceneConfig(
                size=cfg.granule_size, n_plumes=4, seed=base + i,
                background_level=0.15, background_noise=0.04,
                plume_amplitude=(0.5, 0.9),
                plume_sigma_major=(10.0, 22.0),
                plume_sigma_minor=(2.0, 4.0),
                null_blobs=1,
            )
        )
        samples.append(scene_to_sample(scene))
    return samples


def make_weak_label_dataset(
    cfg: DataConfig,
    train: bool = True,
    identify_cfg=None,
) -> List[GranuleSample]:
    """The reference's actual data story (SURVEY.md §0): the classical
    identify pipeline is the *weak labeller* — its accepted plume masks
    become the U-Net's training targets. Generates synthetic granules, runs
    the rg detector on each, and labels tiles with the union of accepted
    plume masks."""
    from plumekit.config.identify import RGIdentifyConfig
    from plumekit.identify import rg as rg_mod

    identify_cfg = identify_cfg or RGIdentifyConfig(max_fires=32)
    n = cfg.n_train_granules if train else cfg.n_eval_granules
    base = cfg.seed if train else cfg.seed + 10_000
    samples = []
    for i in range(n):
        scene = make_scene(
            SyntheticSceneConfig(
                # 3 plumes per 256^2: denser scenes merge plumes past the
                # rg area gate and the labeller accepts nothing
                size=cfg.granule_size, n_plumes=3, seed=base + i,
                background_level=0.2, background_noise=0.05,
                plume_amplitude=(0.6, 0.9),
                plume_sigma_major=(9.0, 16.0),
                plume_sigma_minor=(1.8, 2.8),
                fires_per_plume=(5, 8),
            )
        )
        g = scene.granule
        date = scene.fires.date_time.iloc[0]
        _, _, out = rg_mod.identify(
            g.first_layer(), g.lat, g.lon, date, scene.fires, identify_cfg
        )
        weak = np.zeros(g.shape, np.float32)
        for f in np.nonzero(out["accepted"])[0]:
            weak[out["mask"][f]] = 1.0
        sample = scene_to_sample(scene)
        samples.append(GranuleSample(channels=sample.channels, mask=weak))
    return samples


def _prep_samples(samples: List[GranuleSample], tile: int):
    """Pad sub-tile granules up to one tile (channels replicate, masks
    zero-fill) and precompute the plume-pixel index once per sample
    (np.nonzero over a 1200-square mask per draw was the hot-path cost of
    plume-biased sampling)."""
    prepped = []
    for s in samples:
        h, w = s.channels.shape[:2]
        if h < tile or w < tile:
            ph, pw = max(0, tile - h), max(0, tile - w)
            padded = GranuleSample(
                channels=np.pad(s.channels, ((0, ph), (0, pw), (0, 0)),
                                mode="edge"),
                mask=np.pad(s.mask, ((0, ph), (0, pw))),
            )
            if hasattr(s, "lo"):   # quantized samples carry (lo, scale)
                padded.lo, padded.scale = s.lo, s.scale
            s = padded
        # "plume pixel" = mask above half, NOT merely nonzero: soft
        # (distilled) labels are nonzero almost everywhere — a sigmoid
        # only underflows to 0 below ~-88 — so nonzero would degenerate
        # the 50% plume-centred draws to uniform and materialise an
        # H·W index table. Threshold in the mask's own code (uint8
        # masks encode 1.0 as 255) so float and quantized schedules
        # keep drawing the same tiles.
        half = 127.5 if s.mask.dtype == np.uint8 else 0.5
        prepped.append((s, np.nonzero(s.mask > half)))
    return prepped


def _draw_tile(prepped, tile: int, rng: np.random.Generator):
    """One plume-biased tile draw: (sample, cy, cx). Half the tiles are
    centred near mask pixels so the loss sees positives (plumes are sparse
    in full granules). THE single rng-draw sequence: the float and
    quantized batch iterators both call this, so the same seed yields the
    same tile schedule in either mode (parity-testable)."""
    s, (pys, pxs) = prepped[rng.integers(len(prepped))]
    h, w = s.channels.shape[:2]  # curated granules may vary in size
    if rng.random() < 0.5 and len(pys):
        k = rng.integers(len(pys))
        cy = int(np.clip(pys[k] - tile // 2 + rng.integers(-8, 9),
                         0, h - tile))
        cx = int(np.clip(pxs[k] - tile // 2 + rng.integers(-8, 9),
                         0, w - tile))
    else:
        cy = int(rng.integers(0, h - tile + 1))
        cx = int(rng.integers(0, w - tile + 1))
    return s, cy, cx


def tile_batches(
    samples: List[GranuleSample],
    tile: int,
    batch_size: int,
    rng: np.random.Generator,
    steps: Optional[int] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Infinite (or ``steps``-bounded) iterator of random tile batches:
    (B, tile, tile, C) channels and (B, tile, tile, 1) masks."""
    if not samples:
        raise ValueError(
            "tile_batches got an empty sample list — for curated training "
            "run 'plumekit prepare_model_data' first")
    prepped = _prep_samples(samples, tile)
    count = 0
    while steps is None or count < steps:
        xs = np.empty((batch_size, tile, tile,
                       prepped[0][0].channels.shape[-1]), np.float32)
        ys = np.empty((batch_size, tile, tile, 1), np.float32)
        for b in range(batch_size):
            s, cy, cx = _draw_tile(prepped, tile, rng)
            xs[b] = s.channels[cy : cy + tile, cx : cx + tile]
            ys[b, ..., 0] = s.mask[cy : cy + tile, cx : cx + tile]
        yield xs, ys
        count += 1


def quantize_samples(samples: List[GranuleSample]) -> List[GranuleSample]:
    """Per-granule affine uint16 channel encoding + uint8 masks, packaged
    as GranuleSamples whose ``channels`` carry ``(lo, scale)`` sidecars.

    This is the ONCE-per-granule half of the quantized training-transfer
    path (``TrainConfig.quantize_transfer``): tiles are then sliced,
    stacked, and uploaded in uint16/uint8 — 4 bytes/px instead of 12 over
    the measured transfer-bound host→device hop — and decoded on device
    inside the train step (``make_train_step(dequant=True)``). Doing the
    quantize here instead of per batch keeps it OFF the hot path, the
    round-3 config-5 lesson (host-side per-payload quantize cost cancelled
    the transfer saving on the 1-core host, BASELINE.md)."""
    from plumekit import native
    from plumekit.ops.quant import quantize_uint16

    out = []
    for s in samples:
        q, lo, scale = quantize_uint16(s.channels)
        # masks encode as uint8/255: exact for the {0, 1} labels every
        # standard path produces, and soft labels (offline distillation
        # blends teacher probabilities into the mask plane) survive to
        # within 1/510. The device decode divides by 255 (_dequant_batch)
        m8 = native.quantize_mask_uint8(np.asarray(s.mask, np.float32))
        if m8 is None:
            m8 = np.rint(
                np.clip(s.mask, 0.0, 1.0) * 255.0).astype(np.uint8)
        qs = GranuleSample(channels=q, mask=m8)
        qs.lo, qs.scale = lo, scale
        out.append(qs)
    return out


def tile_batches_quant(
    samples: List[GranuleSample],
    tile: int,
    batch_size: int,
    rng: np.random.Generator,
    steps: Optional[int] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Quantized twin of :func:`tile_batches` over
    :func:`quantize_samples` output: yields ``(q_xs (B, t, t, C) uint16,
    lo (B, C), scale (B, C), y8 (B, t, t, 1) uint8)``. Identical rng-draw
    sequence as the float iterator (shared :func:`_draw_tile`), so the
    same seed samples the same tiles in either mode."""
    if not samples:
        raise ValueError("tile_batches_quant got an empty sample list")
    if not hasattr(samples[0], "lo"):
        raise ValueError(
            "samples lack (lo, scale) sidecars; pass quantize_samples(...) "
            "output, not raw GranuleSamples")
    prepped = _prep_samples(samples, tile)
    count = 0
    c = prepped[0][0].channels.shape[-1]
    while steps is None or count < steps:
        q_xs = np.empty((batch_size, tile, tile, c), np.uint16)
        lo = np.empty((batch_size, c), np.float32)
        scale = np.empty((batch_size, c), np.float32)
        y8 = np.empty((batch_size, tile, tile, 1), np.uint8)
        for b in range(batch_size):
            s, cy, cx = _draw_tile(prepped, tile, rng)
            q_xs[b] = s.channels[cy : cy + tile, cx : cx + tile]
            y8[b, ..., 0] = s.mask[cy : cy + tile, cx : cx + tile]
            lo[b], scale[b] = s.lo, s.scale
        yield q_xs, lo, scale, y8
        count += 1
