"""Quantized training-transfer path (TrainConfig.quantize_transfer):
uint16/uint8 payload codecs, tile-schedule parity with the float
iterator, step-level numerical parity, and the end-to-end loop
(single-step, scanned multi-step, and DP-sharded)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plumekit.config.train import DataConfig, MeshConfig, TrainConfig, UNetConfig
from plumekit.ops.quant import dequantize, quantize_uint16
from plumekit.train.data import (
    make_synthetic_dataset,
    quantize_samples,
    tile_batches,
    tile_batches_quant,
)

SMALL_UNET = UNetConfig(in_channels=2, base_features=8, depth=2,
                        compute_dtype="float32")
DATA = DataConfig(granule_size=96, n_train_granules=2, n_eval_granules=1)


def test_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = (rng.random((64, 64, 2)) * np.array([2.3, 1.0])).astype(np.float32)
    q, lo, scale = quantize_uint16(x)
    assert q.dtype == np.uint16
    back = np.asarray(dequantize(jnp.asarray(q), lo, scale))
    # affine rounding: half a step per channel
    assert np.all(np.abs(back - x) <= scale / 2 + 1e-6)


def test_quant_constant_channel():
    """A constant channel (hi == lo) must encode/decode without NaN/inf."""
    x = np.zeros((8, 8, 2), np.float32)
    x[..., 0] = 0.7
    q, lo, scale = quantize_uint16(x)
    back = np.asarray(dequantize(jnp.asarray(q), lo, scale))
    assert np.allclose(back, x, atol=1e-5)


def test_tile_schedule_parity_and_payload():
    """Same seed → the quantized iterator samples the SAME tiles as the
    float iterator (shared _draw_tile); dequantized channels match within
    the affine step and masks match exactly."""
    samples = make_synthetic_dataset(DATA, train=True)
    fa = tile_batches(samples, 32, 4, np.random.default_rng(7), steps=3)
    qa = tile_batches_quant(quantize_samples(samples), 32, 4,
                            np.random.default_rng(7), steps=3)
    for (xs, ys), (q, lo, scale, y8) in zip(fa, qa):
        assert q.dtype == np.uint16 and y8.dtype == np.uint8
        back = np.asarray(dequantize(jnp.asarray(q),
                                     lo[:, None, None, :],
                                     scale[:, None, None, :]))
        assert np.all(np.abs(back - xs) <= scale[:, None, None, :] / 2
                      + 1e-6)
        # mask codec is uint8/255 (exact for {0,1}; soft distilled labels
        # survive to 1/510)
        np.testing.assert_array_equal(
            y8[..., 0], np.rint(ys[..., 0] * 255.0).astype(np.uint8))


def test_quant_step_matches_float_step():
    """make_train_step(dequant=True) on the quantized payload must track
    the float step on the same tiles (inputs differ by ≤1 affine step)."""
    from plumekit.train.state import create_state
    from plumekit.train.step import make_train_step

    tcfg = TrainConfig(batch_size=4, tile_size=32, learning_rate=1e-3,
                       augment=False)
    state_f = create_state(jax.random.PRNGKey(0), SMALL_UNET, tcfg)
    state_q = create_state(jax.random.PRNGKey(0), SMALL_UNET, tcfg)

    samples = make_synthetic_dataset(DATA, train=True)
    xs, ys = next(tile_batches(samples, 32, 4, np.random.default_rng(3)))
    q, lo, scale = quantize_uint16(xs.reshape(-1, 2))
    q = q.reshape(xs.shape)
    lo_b = np.tile(lo, (4, 1))
    scale_b = np.tile(scale, (4, 1))
    y8 = np.rint(ys * 255.0).astype(np.uint8)

    step_f = make_train_step(augment=False)
    step_q = make_train_step(augment=False, dequant=True)
    rng = jax.random.PRNGKey(5)
    state_f, m_f = step_f(state_f, xs, ys, rng)
    state_q, m_q = step_q(state_q, (q, lo_b, scale_b, y8), rng)
    assert float(m_q["loss"]) == pytest.approx(float(m_f["loss"]),
                                               abs=1e-3)
    pf = jax.tree.leaves(state_f.params)[0]
    pq = jax.tree.leaves(state_q.params)[0]
    np.testing.assert_allclose(np.asarray(pq), np.asarray(pf), atol=1e-4)


def _run(tcfg_kwargs):
    from plumekit.train.loop import train

    return train(
        unet_cfg=SMALL_UNET,
        train_cfg=TrainConfig(batch_size=4, tile_size=32, total_steps=6,
                              warmup_steps=2, log_every=3, augment=False,
                              **tcfg_kwargs),
        data_cfg=DATA,
        checkpoint=False,
    )


def test_train_loop_quantized_matches_float_closely():
    """End-to-end: the quantized loop sees the same tile schedule and lands
    within quantization noise of the float loop."""
    hf = _run({"quantize_transfer": False})
    hq = _run({"quantize_transfer": True})
    assert hq["loss"] == pytest.approx(hf["loss"], abs=5e-3)
    assert hq["eval_iou"][-1] == pytest.approx(hf["eval_iou"][-1], abs=0.02)


def test_train_loop_quantized_multi_dispatch():
    """quantize_transfer composes with steps_per_dispatch (chunked tuples
    stack and scan correctly)."""
    hq1 = _run({"quantize_transfer": True})
    hqk = _run({"quantize_transfer": True, "steps_per_dispatch": 3})
    assert hqk["loss"] == pytest.approx(hq1["loss"], abs=1e-3)


def test_train_loop_quantized_dp_mesh():
    """quantize_transfer under GSPMD DP: the 4-tuple payload shards over
    the data axis and the loop runs."""
    from plumekit.train.loop import train

    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >1 device")
    hist = train(
        unet_cfg=SMALL_UNET,
        train_cfg=TrainConfig(batch_size=4, tile_size=32, total_steps=4,
                              warmup_steps=2, log_every=2, augment=True,
                              quantize_transfer=True),
        data_cfg=DATA,
        mesh_cfg=MeshConfig(data=n),
        checkpoint=False,
    )
    assert np.isfinite(hist["loss"]).all()


def test_quantize_rejects_nonfinite():
    """NaN input must fail at the encode (NaN→uint16 is platform-defined
    garbage that would decode to a constant channel with no error)."""
    x = np.ones((4, 4, 2), np.float32)
    x[1, 1, 0] = np.nan
    with pytest.raises(ValueError, match="finite"):
        quantize_uint16(x)
