"""Device-resident training data (TrainConfig.device_data): HBM dataset
assembly, in-program tile-draw parity vs an eager host evaluation of the
same keys, quantized-storage equivalence, and the end-to-end loop
(single-device, chunked dispatch, and DP-sharded)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plumekit.config.train import DataConfig, MeshConfig, TrainConfig, UNetConfig
from plumekit.train.data import make_synthetic_dataset
from plumekit.train.device_data import (
    build_device_dataset,
    draw_tile_batch,
    make_device_multi_step,
)

SMALL_UNET = UNetConfig(in_channels=2, base_features=8, depth=2,
                        compute_dtype="float32")
DATA = DataConfig(granule_size=96, n_train_granules=2, n_eval_granules=1)
TILE = 32


@pytest.fixture(scope="module")
def samples():
    return make_synthetic_dataset(DATA, train=True)


def test_build_shapes_and_plume_index(samples):
    ds = build_device_dataset(samples, TILE)
    n = len(samples)
    assert ds.channels.shape == (n, 96, 96, 2)
    assert ds.masks.shape == (n, 96, 96)
    assert ds.lo is None and ds.scale is None
    for i, s in enumerate(samples):
        ys, xs = np.nonzero(s.mask > 0.5)
        assert int(ds.plume_count[i]) == len(ys)
        np.testing.assert_array_equal(
            np.asarray(ds.plume_rows[i, : len(ys)]), ys)
        np.testing.assert_array_equal(
            np.asarray(ds.plume_cols[i, : len(xs)]), xs)
    np.testing.assert_array_equal(np.asarray(ds.heights), [96, 96])


def test_build_pads_subtile_granules(samples):
    """A granule smaller than one tile edge-pads up to the tile (matching
    the host path's _prep_samples) and records the padded extent."""
    small = [type(samples[0])(channels=samples[0].channels[:20, :20],
                              mask=samples[0].mask[:20, :20])]
    ds = build_device_dataset(small, TILE)
    assert ds.channels.shape[1:3] == (TILE, TILE)
    assert int(ds.heights[0]) == TILE and int(ds.widths[0]) == TILE
    # edge padding replicates the border row/col
    np.testing.assert_array_equal(np.asarray(ds.channels[0, 19]),
                                  np.asarray(ds.channels[0, 25]))


def test_draw_respects_bounds_and_bias(samples):
    """Every drawn tile lies inside the valid extent; with plume pixels
    present, a large key sample hits plume-overlapping tiles well over the
    uniform rate (the 50% biased draws)."""
    ds = build_device_dataset(samples, TILE)
    xs, ys = jax.jit(
        lambda k: draw_tile_batch(ds, k, 256, TILE)
    )(jax.random.PRNGKey(0))
    assert xs.shape == (256, TILE, TILE, 2)
    assert ys.shape == (256, TILE, TILE, 1)
    assert np.isfinite(np.asarray(xs)).all()
    frac_plume = float((np.asarray(ys) > 0.5).any(axis=(1, 2, 3)).mean())
    assert frac_plume > 0.4   # ~half the draws are plume-centred


def test_in_program_draw_matches_eager_host_eval(samples):
    """Schedule parity: one step of the jitted scanned program equals the
    standard train step applied to an EAGER draw_tile_batch evaluation of
    the same folded key — the in-program draws are exactly the pure
    function's output, so the schedule is auditable from the host."""
    from plumekit.train.state import create_state
    from plumekit.train.step import make_train_step

    tcfg = TrainConfig(batch_size=4, tile_size=TILE, learning_rate=1e-3)
    base_rng = jax.random.PRNGKey(42)
    ds = build_device_dataset(samples, TILE)

    state_a = create_state(jax.random.PRNGKey(0), SMALL_UNET, tcfg)
    state_b = create_state(jax.random.PRNGKey(0), SMALL_UNET, tcfg)

    multi = make_device_multi_step(augment=True, base_rng=base_rng,
                                   tile=TILE, batch_size=4)
    step_idx = 7
    state_a, m_a = multi(state_a, ds, jnp.asarray([step_idx]))

    k = jax.random.fold_in(base_rng, step_idx)
    k_draw, k_aug = jax.random.split(k)
    xs, ys = draw_tile_batch(ds, k_draw, 4, TILE)
    step = make_train_step(augment=True)
    state_b, m_b = step(state_b, xs, ys, k_aug)

    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), abs=1e-5)
    pa = jax.tree.leaves(state_a.params)[0]
    pb = jax.tree.leaves(state_b.params)[0]
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_quantized_storage_matches_float_schedule(samples):
    """quantized=True draws the SAME tiles (shared draw over shared keys)
    and decodes within the affine codec error."""
    key = jax.random.PRNGKey(3)
    ds_f = build_device_dataset(samples, TILE)
    ds_q = build_device_dataset(samples, TILE, quantized=True)
    assert ds_q.channels.dtype == jnp.uint16
    assert ds_q.masks.dtype == jnp.uint8
    xf, yf = draw_tile_batch(ds_f, key, 16, TILE)
    xq, yq = draw_tile_batch(ds_q, key, 16, TILE)
    # channel error <= scale/2 per granule; use the global max as the bound
    bound = float(np.asarray(ds_q.scale).max()) / 2 + 1e-6
    assert float(jnp.abs(xq - xf).max()) <= bound
    np.testing.assert_allclose(np.asarray(yq), np.asarray(yf),
                               atol=1.0 / 510.0)


def _run(tcfg_kwargs):
    from plumekit.train.loop import train

    return train(
        unet_cfg=SMALL_UNET,
        train_cfg=TrainConfig(batch_size=4, tile_size=TILE, total_steps=6,
                              warmup_steps=2, log_every=3, augment=False,
                              **tcfg_kwargs),
        data_cfg=DATA,
        checkpoint=False,
    )


def test_train_loop_device_data_runs_and_chunks():
    """End-to-end loop with device_data: finite losses, and K=3 chunked
    dispatch matches K=1 exactly (same folded step keys either way)."""
    h1 = _run({"device_data": True})
    hk = _run({"device_data": True, "steps_per_dispatch": 3})
    assert np.isfinite(h1["loss"]).all()
    assert hk["loss"] == pytest.approx(h1["loss"], abs=1e-4)


def test_train_loop_device_data_quantized():
    """device_data + quantize_transfer stores the HBM copy uint16/uint8 and
    lands within codec noise of the float storage."""
    hf = _run({"device_data": True})
    hq = _run({"device_data": True, "quantize_transfer": True})
    assert hq["loss"] == pytest.approx(hf["loss"], abs=5e-3)


def test_train_loop_device_data_dp_mesh():
    """device_data under GSPMD DP: replicated dataset, batch sharding-
    constrained over data — loss matches the single-device run (the draw is
    replicated deterministic work)."""
    from plumekit.train.loop import train

    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >1 device")
    h1 = _run({"device_data": True})
    hm = train(
        unet_cfg=SMALL_UNET,
        train_cfg=TrainConfig(batch_size=4, tile_size=TILE, total_steps=6,
                              warmup_steps=2, log_every=3, augment=False,
                              device_data=True),
        data_cfg=DATA,
        mesh_cfg=MeshConfig(data=n),
        checkpoint=False,
    )
    assert hm["loss"] == pytest.approx(h1["loss"], abs=1e-3)
