"""AOT export / serving artifact (plumekit.infer.export).

The reference promised a deployable model (README.md:41-45) but shipped
none; plumekit serves the exact sliding-window program as serialized
StableHLO. Contract under test: bit-exact roundtrip vs the live jit,
portable multi-platform artifacts, shape guards, and the streaming +
predict-CLI serving paths.
"""

import os

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp
import pytest

from plumekit.config.train import InferConfig, UNetConfig, TrainConfig
from plumekit.infer import make_sliding_infer, stream_inference
from plumekit.infer.export import (export_sliding_infer, is_artifact,
                                   load_exported, save_exported)
from plumekit.infer.sliding import make_multi_granule_infer
from plumekit.models import UNet


def _tiny(rng):
    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="float32")
    model = UNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 2)), train=False)
    icfg = InferConfig(tile_size=64, overlap=8, batch_tiles=2)
    img = jnp.asarray(rng.random((96, 96, 2), np.float32))
    return cfg, model, variables, icfg, img


def test_export_roundtrip_bit_exact(tmp_path, rng):
    """Deserialized program == live jit, bitwise (same HLO, same backend)."""
    cfg, model, variables, icfg, img = _tiny(rng)
    exported, meta = export_sliding_infer(variables, cfg, icfg, (96, 96),
                                          platforms=("cpu",))
    art = str(tmp_path / "artifact")
    save_exported(exported, meta, art)
    assert is_artifact(art)

    fn, meta2 = load_exported(art)
    assert meta2["granule_hw"] == [96, 96] and meta2["granules"] == 1
    p_exp, m_exp = fn(variables, img)
    live = make_sliding_infer(model.apply, icfg, channels=2)
    p_live, m_live = live(variables, img)
    np.testing.assert_array_equal(np.asarray(p_exp), np.asarray(p_live))
    np.testing.assert_array_equal(np.asarray(m_exp), np.asarray(m_live))


def test_export_multi_granule_matches_live_multi(tmp_path, rng):
    """G>1 exports the one-dispatch multi-granule program; output matches
    the live make_multi_granule_infer bitwise."""
    cfg, model, variables, icfg, img = _tiny(rng)
    exported, meta = export_sliding_infer(variables, cfg, icfg, (96, 96),
                                          granules=3, platforms=("cpu",))
    art = str(tmp_path / "artifact")
    save_exported(exported, meta, art)
    fn, _ = load_exported(art)
    stack = jnp.stack([img, img * 0.5, img * 0.1])
    p_exp, _ = fn(variables, stack)
    live = make_multi_granule_infer(model.apply, icfg, channels=2)
    p_live, _ = live(variables, stack)
    assert p_exp.shape == (3, 96, 96)
    np.testing.assert_array_equal(np.asarray(p_exp), np.asarray(p_live))


def test_export_shape_guards(tmp_path, rng):
    cfg, model, variables, icfg, img = _tiny(rng)
    with pytest.raises(ValueError, match="divisible"):
        export_sliding_infer(variables, cfg, icfg, (70, 96))
    exported, meta = export_sliding_infer(variables, cfg, icfg, (96, 96),
                                          platforms=("cpu",))
    art = str(tmp_path / "artifact")
    save_exported(exported, meta, art)
    fn, _ = load_exported(art)
    with pytest.raises(ValueError, match="expects image shape"):
        fn(variables, jnp.zeros((64, 64, 2)))
    # platform mismatch fails at LOAD with the remedy in the message
    # (not deep inside the first streamed batch)
    import json
    mpath = os.path.join(art, "meta.json")
    meta_d = json.load(open(mpath))
    meta_d["platforms"] = ["tpu"]
    json.dump(meta_d, open(mpath, "w"))
    with pytest.raises(ValueError, match="re-export"):
        load_exported(art)
    # future-format artifacts refuse loudly instead of misbehaving
    meta_d["format_version"] = 99
    json.dump(meta_d, open(mpath, "w"))
    with pytest.raises(ValueError, match="format_version"):
        load_exported(art)


def _granules_on_disk(tmp_path, rng, n, shape=(96, 96)):
    from plumekit.io.granule import Granule, save_granule

    paths = []
    for i in range(n):
        aod = rng.random(shape).astype(np.float32)
        g = Granule(name=f"g{i}", lat=np.zeros(shape), lon=np.zeros(shape),
                    layers={"t0": aod})
        p = str(tmp_path / f"g{i}.npz")
        save_granule(p, g)
        paths.append(p)
    return paths


def test_stream_inference_with_exported_batched(tmp_path, rng):
    """The serving path end-to-end: exported G=2 program through
    stream_inference(infer_is_batched=True), ragged tail padded by
    repetition — results equal the live per-granule stream."""
    cfg, model, variables, icfg, _ = _tiny(rng)
    paths = _granules_on_disk(tmp_path, rng, 3)

    live = make_sliding_infer(model.apply, icfg, channels=2)
    ref = dict(stream_inference(paths, live, variables, cfg.depth))

    exported, meta = export_sliding_infer(variables, cfg, icfg, (96, 96),
                                          granules=2, platforms=("cpu",))
    art = str(tmp_path / "artifact")
    save_exported(exported, meta, art)
    fn, _ = load_exported(art)
    got = dict(stream_inference(paths, fn, variables, cfg.depth,
                                batch_granules=2, infer_is_batched=True))
    assert list(got) == [f"g{i}" for i in range(3)]
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-6)


def test_stream_inference_batched_guard():
    with pytest.raises(ValueError, match="infer_is_batched"):
        list(stream_inference([], lambda v, x: (x, x), {}, 2,
                              batch_granules=1, infer_is_batched=True))


def test_cli_export_then_predict(tmp_path, rng):
    """export_model → predict_model --exported reproduces the live predict
    outputs (the full serving workflow through the CLI)."""
    from plumekit.cli import main as cli_main
    from plumekit.config.paths import PathsConfig
    from plumekit.io.granule import Granule, save_granule

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    mdir = paths.ensure("maiac_dir")
    shape = (96, 96)
    for i in range(3):
        aod = rng.random(shape).astype(np.float32)
        g = Granule(name=f"s{i}", lat=np.zeros(shape), lon=np.zeros(shape),
                    layers={"t0": aod})
        save_granule(os.path.join(mdir, f"s{i}.npz"), g)

    art = str(tmp_path / "artifact")
    # same tile/overlap geometry as the live run below so outputs compare
    assert cli_main(["export_model", "--root", root, "--granule", "96",
                     "--batch-granules", "2", "--tile", "64",
                     "--overlap", "32", "--batch-tiles", "4",
                     "--platforms", "cpu", "--out", art]) == 0
    assert is_artifact(art)

    pred_dir = os.path.join(root, "processed", "predictions")
    assert cli_main(["predict_model", "--root", root, "--tile", "64"]) == 0
    live = {f: np.load(os.path.join(pred_dir, f))["probs"]
            for f in sorted(os.listdir(pred_dir)) if f.endswith(".npz")}
    for f in os.listdir(pred_dir):
        os.remove(os.path.join(pred_dir, f))

    assert cli_main(["predict_model", "--root", root,
                     "--exported", art]) == 0
    served = {f: np.load(os.path.join(pred_dir, f))["probs"]
              for f in sorted(os.listdir(pred_dir)) if f.endswith(".npz")}
    assert set(served) == set(live) and len(served) == 3
    for f in live:
        # live predict uses tile 64 on these tiny granules too; exported
        # program was built with the same geometry, so outputs agree to
        # numerical tolerance (vmapped-batch bf16 grouping differs at G>1
        # only for bf16 compute; default UNet is bf16 -> loose tol)
        np.testing.assert_allclose(served[f], live[f], atol=5e-2)
