"""Viz artifacts, streaming inference, metrics writer."""

import os

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from plumekit.config.train import InferConfig, UNetConfig
from plumekit.infer import make_sliding_infer, stream_inference
from plumekit.io.granule import Granule, save_granule
from plumekit.models import UNet
from plumekit.utils import MetricsWriter
from plumekit.viz import (
    plot_identify_bboxes,
    plot_identify_hulls,
    plot_prediction,
    plot_training_history,
)


def test_viz_plots(tmp_path, rng):
    aod = rng.random((64, 64)).astype(np.float32)
    aod_df = pd.DataFrame(
        [{"plume_min_row": 5, "plume_max_row": 20, "plume_min_col": 10,
          "plume_max_col": 30}]
    )
    hull_df = pd.DataFrame(
        {"id": [0.0] * 3, "hull_x": [5, 20, 10], "hull_y": [5, 10, 20]}
    )
    p1 = str(tmp_path / "bbox.png")
    p2 = str(tmp_path / "hull.png")
    p3 = str(tmp_path / "pred.png")
    p4 = str(tmp_path / "hist.png")
    plot_identify_bboxes(aod, aod_df, p1)
    plot_identify_hulls(aod, hull_df, p2)
    plot_prediction(aod, rng.random((64, 64)).astype(np.float32), p3)
    plot_training_history({"loss": [1, 0.5], "iou": [0.1, 0.6],
                           "eval_iou": [0.55]}, p4)
    for p in (p1, p2, p3, p4):
        assert os.path.getsize(p) > 1000


def _mini_model_and_paths(tmp_path, rng, n=5, shape=(70, 90)):
    """Shared fixture: tiny U-Net + sliding infer + n on-disk granules
    (70×90 default: exercises pad_to_multiple + crop-back)."""
    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="float32")
    model = UNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 2)), train=False)
    infer = make_sliding_infer(
        model.apply, InferConfig(tile_size=64, overlap=8, batch_tiles=2),
        channels=2,
    )
    paths = []
    for i in range(n):
        aod = rng.random(shape).astype(np.float32)
        lat, lon = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
        g = Granule(layers={"t0": aod}, lat=lat, lon=lon, name=f"g{i}")
        p = str(tmp_path / f"g{i}.npz")
        save_granule(p, g)
        paths.append(p)
    return cfg, infer, variables, paths


def test_stream_inference(tmp_path, rng):
    cfg, infer, variables, paths = _mini_model_and_paths(tmp_path, rng, n=3)
    results = list(stream_inference(paths, infer, variables, cfg.depth))
    assert [n for n, _ in results] == ["g0", "g1", "g2"]
    for _, probs in results:
        assert probs.shape == (70, 90)
        assert np.isfinite(probs).all()


def test_metrics_writer(tmp_path):
    path = str(tmp_path / "m.csv")
    w = MetricsWriter(path)
    w.write(1, {"loss": 1.0, "iou": 0.2})
    w.write(2, {"loss": 0.5, "iou": 0.4})
    # resume appends without duplicating header
    w2 = MetricsWriter(path)
    w2.write(3, {"loss": 0.3, "iou": 0.6})
    df = pd.read_csv(path)
    assert list(df.step) == [1, 2, 3]
    assert df.loss.iloc[-1] == 0.3


def test_decode_pool_ordered_and_parallel():
    """decode_pool must deliver in submission order regardless of per-item
    decode latency, and propagate worker exceptions at the failing item."""
    import time

    from plumekit.io.prefetch import decode_pool

    def slow_decode(i):
        time.sleep(0.05 if i % 2 == 0 else 0.0)  # evens are slower
        return i * 10

    out = list(decode_pool(range(8), slow_decode, workers=4))
    assert out == [i * 10 for i in range(8)]

    def maybe_fail(i):
        if i == 3:
            raise ValueError("boom")
        return i

    got = []
    import pytest as _pytest
    with _pytest.raises(ValueError, match="boom"):
        for x in decode_pool(range(6), maybe_fail, workers=3):
            got.append(x)
    assert got == [0, 1, 2]  # items before the failure arrived in order


def test_stream_inference_with_decode_pool(tmp_path, rng):
    """Pool-decoded streaming inference must produce identical results to
    decode_workers=1 (ordering and numerics preserved)."""
    cfg, infer, variables, paths = _mini_model_and_paths(tmp_path, rng, n=5)
    serial = list(stream_inference(paths, infer, variables, cfg.depth,
                                   decode_workers=1))
    pooled = list(stream_inference(paths, infer, variables, cfg.depth,
                                   decode_workers=4))
    assert [n for n, _ in serial] == [n for n, _ in pooled]
    for (_, a), (_, b) in zip(serial, pooled):
        np.testing.assert_array_equal(a, b)


def test_stream_inference_quantized_matches_fp32(tmp_path, rng):
    """uint16 payloads (half the relay bytes) reproduce the fp32 stream
    within the quantisation step (~3e-5 of range -> prob delta well under
    1e-2)."""
    cfg, infer, variables, paths = _mini_model_and_paths(tmp_path, rng)
    ref = dict(stream_inference(paths, infer, variables, cfg.depth))
    q = dict(stream_inference(paths, infer, variables, cfg.depth,
                              quantize=True))
    assert ref.keys() == q.keys()
    for k in ref:
        np.testing.assert_allclose(q[k], ref[k], atol=1e-2)
        assert q[k].shape == ref[k].shape
    # and quantisation really happened: if quantize=True silently fell
    # through to the fp32 path every output would be bit-identical
    assert any(not np.array_equal(q[k], ref[k]) for k in ref)


def test_stream_inference_batched_matches_serial(tmp_path, rng):
    """batch_granules groups same-shape granules into one vmapped program;
    results are bit-equal to the serial stream, including the ragged tail
    group (5 granules, G=2 -> groups of 2/2/1)."""
    cfg, infer, variables, paths = _mini_model_and_paths(tmp_path, rng, n=5)
    ref = dict(stream_inference(paths, infer, variables, cfg.depth))
    bat = dict(stream_inference(paths, infer, variables, cfg.depth,
                                batch_granules=2))
    assert list(bat.keys()) == [f"g{i}" for i in range(5)]
    for k in ref:
        np.testing.assert_allclose(bat[k], ref[k], rtol=0, atol=1e-6)


def test_stream_inference_batched_quantized(tmp_path, rng):
    """The two levers compose: grouped uint16 uploads, dequant inside the
    one vmapped program."""
    cfg, infer, variables, paths = _mini_model_and_paths(tmp_path, rng, n=4)
    ref = dict(stream_inference(paths, infer, variables, cfg.depth))
    bq = dict(stream_inference(paths, infer, variables, cfg.depth,
                               quantize=True, batch_granules=4))
    for k in ref:
        np.testing.assert_allclose(bq[k], ref[k], atol=1e-2)


def test_stream_inference_quantized_output(tmp_path, rng):
    """uint8 prob readback (quarter the downlink bytes) reproduces the
    fp32 stream within the output codec step (1/510), on both the
    single-granule and the grouped program."""
    cfg, infer, variables, paths = _mini_model_and_paths(tmp_path, rng, n=4)
    ref = dict(stream_inference(paths, infer, variables, cfg.depth))
    qo = dict(stream_inference(paths, infer, variables, cfg.depth,
                               quantize_output=True))
    assert ref.keys() == qo.keys()
    for k in ref:
        assert qo[k].dtype == np.float32
        np.testing.assert_allclose(qo[k], ref[k], atol=1 / 510 + 1e-7)
        # values land on the uint8/255 lattice (within fp32 division
        # rounding — q/255*255 is not bit-exactly q)
        np.testing.assert_allclose(qo[k] * 255, np.round(qo[k] * 255),
                                   atol=1e-3)
    # compose with grouped programs AND uint16 uploads in one run
    all_on = dict(stream_inference(paths, infer, variables, cfg.depth,
                                   quantize=True, quantize_output=True,
                                   batch_granules=3))
    for k in ref:
        np.testing.assert_allclose(all_on[k], ref[k],
                                   atol=1e-2 + 1 / 510)


def test_multi_granule_infer_matches_per_granule(rng):
    """make_multi_granule_infer == the single-granule path per granule."""
    from plumekit.infer.sliding import make_multi_granule_infer

    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="float32")
    model = UNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 2)), train=False)
    icfg = InferConfig(tile_size=64, overlap=8, batch_tiles=4)
    single = make_sliding_infer(model.apply, icfg, channels=2)
    multi = make_multi_granule_infer(model.apply, icfg, channels=2)
    images = jnp.asarray(rng.random((3, 128, 128, 2)).astype(np.float32))
    mp, mm = multi(variables, images)
    assert mp.shape == (3, 128, 128)
    for g in range(3):
        sp, sm = single(variables, images[g])
        np.testing.assert_allclose(np.asarray(mp[g]), np.asarray(sp),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(mm[g]), np.asarray(sm))
