"""Inference + parallelism tests: overlap-blend stitching equals direct
forward; halo exchange correctness; sharded whole-granule inference matches
unsharded at fp32 tolerance (SURVEY.md §7 hard part #3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from plumekit.config.train import InferConfig, MeshConfig, UNetConfig
from plumekit.models import UNet, receptive_field
from plumekit.infer import (
    make_sliding_infer,
    make_sharded_infer,
    choose_halo,
    tile_grid,
)
from plumekit.parallel import make_mesh, exchange_halo_block
from plumekit.parallel.halo import shard_map


UNET = UNetConfig(in_channels=2, base_features=8, depth=2,
                  compute_dtype="float32")


@pytest.fixture(scope="module")
def model_and_vars():
    model = UNet(UNET)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 2)), train=False
    )
    return model, variables


def test_tile_grid_covers():
    starts = tile_grid(100, 32, 24)
    assert starts[0] == 0 and starts[-1] == 68
    covered = np.zeros(100, bool)
    for s in starts:
        covered[s : s + 32] = True
    assert covered.all()
    assert len(tile_grid(32, 32, 24)) == 1


def test_sliding_infer_matches_direct(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    image = rng.random((96, 96, 2)).astype(np.float32)
    cfg = InferConfig(tile_size=96, overlap=0, batch_tiles=1)
    infer = make_sliding_infer(model.apply, cfg, channels=2)
    probs, mask = infer(variables, jnp.asarray(image))
    direct = jax.nn.sigmoid(
        model.apply(variables, jnp.asarray(image)[None], train=False)[0, ..., 0]
    )
    np.testing.assert_allclose(np.asarray(probs), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_sliding_infer_fast_tiling_disjoint(model_and_vars):
    """overlap=0 with a multi-tile grid (the measured fast-tiling serving
    mode, +27.5% at the headline config): each disjoint tile's stitched
    region equals that tile's direct forward exactly — no taper, no
    cross-tile mixing."""
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    image = rng.random((96, 96, 2)).astype(np.float32)
    cfg = InferConfig(tile_size=48, overlap=0, batch_tiles=2)
    infer = make_sliding_infer(model.apply, cfg, channels=2)
    probs, _ = infer(variables, jnp.asarray(image))
    probs = np.asarray(probs)
    for oy in (0, 48):
        for ox in (0, 48):
            tile = jnp.asarray(image[oy:oy + 48, ox:ox + 48])[None]
            direct = jax.nn.sigmoid(
                model.apply(variables, tile, train=False)[0, ..., 0])
            np.testing.assert_allclose(
                probs[oy:oy + 48, ox:ox + 48], np.asarray(direct),
                rtol=1e-5, atol=1e-5)


def test_sliding_infer_fast_tiling_ragged_shape(model_and_vars):
    """overlap=0 on a non-tile-multiple image: the single-reshape assembly
    must reproduce the per-tile forwards of the edge-padded lattice and
    crop back exactly (same replication semantics as the parity-class
    path it replaced)."""
    model, variables = model_and_vars
    rng = np.random.default_rng(2)
    image = rng.random((70, 52, 2)).astype(np.float32)
    cfg = InferConfig(tile_size=48, overlap=0, batch_tiles=3)
    infer = make_sliding_infer(model.apply, cfg, channels=2)
    probs, mask = infer(variables, jnp.asarray(image))
    assert probs.shape == (70, 52)
    padded = np.pad(image, ((0, 96 - 70), (0, 96 - 52), (0, 0)),
                    mode="edge")
    expect = np.zeros((96, 96), np.float32)
    for oy in (0, 48):
        for ox in (0, 48):
            tile = jnp.asarray(padded[oy:oy + 48, ox:ox + 48])[None]
            expect[oy:oy + 48, ox:ox + 48] = np.asarray(jax.nn.sigmoid(
                model.apply(variables, tile, train=False)[0, ..., 0]))
    np.testing.assert_allclose(np.asarray(probs), expect[:70, :52],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask),
                                  expect[:70, :52] > cfg.threshold)


def test_sliding_infer_overlap_blend_smooth(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    image = rng.random((128, 128, 2)).astype(np.float32)
    cfg = InferConfig(tile_size=64, overlap=16, batch_tiles=4)
    infer = make_sliding_infer(model.apply, cfg, channels=2)
    probs, mask = infer(variables, jnp.asarray(image))
    assert probs.shape == (128, 128)
    p = np.asarray(probs)
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()
    # interior tiles agree with direct forward away from tile borders: the
    # stitched canvas must be close to the direct full-image forward in the
    # deep interior of any tile (receptive field fully inside)
    direct = np.asarray(
        jax.nn.sigmoid(
            model.apply(variables, jnp.asarray(image)[None], train=False)[
                0, ..., 0
            ]
        )
    )
    core = (slice(24, 40), slice(24, 40))
    np.testing.assert_allclose(p[core], direct[core], atol=0.05)


def test_halo_exchange_reconstructs_neighbors():
    mesh = make_mesh(MeshConfig(data=1, y=2, x=4))
    h, w, halo = 16, 32, 3
    rng = np.random.default_rng(0)
    full = rng.random((h, w)).astype(np.float32)

    def body(block):
        return exchange_halo_block(block, halo)[None, None]

    fn = shard_map(body, mesh=mesh, in_specs=(P("y", "x"),),
                   out_specs=P("y", "x", None, None))
    out = np.asarray(fn(jnp.asarray(full)))  # (2, 4, 8+6, 8+6)
    bh, bw = h // 2, w // 4
    padded = np.pad(full, halo)
    for iy in range(2):
        for ix in range(4):
            expect = padded[iy * bh : iy * bh + bh + 2 * halo,
                            ix * bw : ix * bw + bw + 2 * halo]
            np.testing.assert_array_equal(out[iy, ix], expect)


def test_sharded_infer_matches_unsharded(model_and_vars):
    model, variables = model_and_vars
    mesh = make_mesh(MeshConfig(data=1, y=2, x=4))
    rng = np.random.default_rng(2)
    image = rng.random((64, 128, 2)).astype(np.float32)

    min_halo = receptive_field(UNET.depth)
    halo = choose_halo(min_halo, 64 // 2, UNET.depth)
    infer = make_sharded_infer(model.apply, mesh, halo)
    probs, mask = infer(variables, jnp.asarray(image))

    direct = jax.nn.sigmoid(
        model.apply(variables, jnp.asarray(image)[None], train=False)[0, ..., 0]
    )
    # interior must match at fp32 tolerance. Pixels within the receptive
    # field of the *true* image border can differ: the sharded path fills
    # edge halos with zeros and then runs convs over them (conv(0) ≠ 0 once
    # norm/bias apply), while the direct path zero-pads per conv layer. Shard
    # *interior* boundaries are exact because the halo carries real data.
    p = np.asarray(probs)
    d = np.asarray(direct)
    assert np.isfinite(p).all()
    r = min_halo
    np.testing.assert_allclose(p[r:-r, r:-r], d[r:-r, r:-r], atol=1e-4)
    # shard seams (y=32, x=32/64/96) sit in the compared interior: row 32
    # crossing must be smooth/exact
    np.testing.assert_allclose(p[28:36, r:-r], d[28:36, r:-r], atol=1e-4)


def test_sharded_infer_matches_unsharded_unetpp():
    """The receptive_field() radius must also be sufficient for UNet++
    (its deepest-row path sets the radius — models/unet.py docstring):
    spatially-sharded UNet++ inference matches unsharded in the interior."""
    from plumekit.models import build_model

    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="float32", arch="unetpp")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 64, 64, 2)), train=False)
    mesh = make_mesh(MeshConfig(data=1, y=2, x=4))
    rng = np.random.default_rng(5)
    image = rng.random((64, 128, 2)).astype(np.float32)

    min_halo = receptive_field(cfg.depth)
    halo = choose_halo(min_halo, 64 // 2, cfg.depth)
    infer = make_sharded_infer(model.apply, mesh, halo)
    probs, _ = infer(variables, jnp.asarray(image))
    direct = jax.nn.sigmoid(
        model.apply(variables, jnp.asarray(image)[None],
                    train=False)[0, ..., 0])
    p, d = np.asarray(probs), np.asarray(direct)
    assert np.isfinite(p).all()
    r = min_halo
    np.testing.assert_allclose(p[r:-r, r:-r], d[r:-r, r:-r], atol=1e-4)


def test_sliding_stitch_parity_class_fast_path():
    """The regular-grid parity-class assembly must reproduce a known global
    function exactly: with a pointwise apply, every tile agrees on overlaps,
    so the blend must return the function itself — for regular grids,
    clamped grids (internal edge padding), sub-tile images (general path),
    and deep overlaps (general path)."""
    import jax.numpy as jnp

    from plumekit.config.train import InferConfig
    from plumekit.infer import make_sliding_infer

    def apply_fn(variables, tiles, train=False):
        return (tiles[..., 0:1] * 2.0 - 1.0).astype(jnp.float32)

    rng = np.random.default_rng(5)
    cases = [
        (64, 16, (176, 176)),   # exact grid: 176 = 64 + 2*56? no — clamped
        (64, 16, (160, 208)),   # 160 = 64+2*48: regular in rows
        (64, 16, (70, 90)),     # clamped both axes
        (64, 40, (128, 128)),   # overlap > stride -> general path
    ]
    for tile, overlap, (h, w) in cases:
        infer = make_sliding_infer(
            apply_fn, InferConfig(tile_size=tile, overlap=overlap,
                                  batch_tiles=3), channels=2)
        img = rng.random((h, w, 2)).astype(np.float32)
        probs, mask = infer({}, jnp.asarray(img))
        expect = 1.0 / (1.0 + np.exp(-(img[..., 0] * 2.0 - 1.0)))
        np.testing.assert_allclose(np.asarray(probs), expect, atol=2e-6,
                                   err_msg=f"tile={tile} ov={overlap} "
                                           f"hw={(h, w)}")
        assert mask.shape == (h, w)


def test_batch_infer_sharded_matches_unsharded(model_and_vars):
    """Config 5's pod-slice composition: D devices x G local granules per
    program — outputs must equal the unsharded multi-granule path for the
    same stack."""
    from plumekit.infer import make_batch_infer_sharded, make_multi_granule_infer

    model, variables = model_and_vars
    mesh = make_mesh(MeshConfig(data=4))
    cfg = InferConfig(tile_size=64, overlap=16, batch_tiles=4)
    rng = np.random.default_rng(3)
    # 8 granules over 4 devices -> G=2 per device
    images = jnp.asarray(rng.random((8, 96, 96, 2)).astype(np.float32))
    sharded = make_batch_infer_sharded(model.apply, mesh, cfg, channels=2)
    plain = make_multi_granule_infer(model.apply, cfg, channels=2)
    ps, ms = sharded(variables, images)
    pu, mu = plain(variables, images)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ms), np.asarray(mu))


def test_effective_batch_minimises_fill():
    """The adaptive per-forward batch must (a) never exceed batch_tiles or
    the grid count, (b) never pad MORE than the naive min(batch_tiles, n)
    choice, and (c) hit the measured case that motivated it: the 841-tile
    grid of an 8192² granule at 256-px stride padded 183 duplicate
    forwards at batch 256 (+22% FLOPs); the search must get that under
    1%."""
    from plumekit.infer.sliding import _effective_batch

    for n in (1, 2, 7, 16, 100, 289, 841, 1024):
        for bt in (1, 3, 64, 128, 256):
            eff = _effective_batch(bt, n)
            assert 1 <= eff <= min(bt, n) or eff == 1
            naive = max(1, min(bt, n))
            assert (-n) % eff <= (-n) % naive
    assert (-841) % _effective_batch(256, 841) <= 8  # was 183


def test_sliding_infer_invariant_to_batch_tiles(model_and_vars):
    """Stitched output must be invariant to batch_tiles (up to conv
    accumulation order, ~1e-7 — XLA schedules different batch sizes
    differently): batch-fill duplicates are dropped (fast path) or
    weight-compensated (general path), and the adaptive batch is pure
    scheduling."""
    model, variables = model_and_vars
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.random((160, 160, 2)).astype(np.float32))
    outs = []
    for bt in (1, 3, 5, 25):
        infer = make_sliding_infer(
            model.apply, InferConfig(tile_size=32, overlap=0,
                                     batch_tiles=bt), channels=2)
        probs, mask = infer(variables, img)
        outs.append((np.asarray(probs), np.asarray(mask)))
    for probs, mask in outs[1:]:
        np.testing.assert_allclose(probs, outs[0][0], atol=1e-6)
        # masks may only disagree where probs sit within tol of threshold
        flip = mask != outs[0][1]
        assert np.abs(outs[0][0][flip] - 0.5).max(initial=0.0) < 1e-6
