"""UNet++ architecture family: shapes/contract, dense-skip structure,
training convergence, arch selection + persistence through the checkpoint
record, and the shared infer path."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plumekit.config.train import DataConfig, TrainConfig, UNetConfig
from plumekit.models import UNet, UNetPP, build_model

PP_SMALL = UNetConfig(in_channels=2, base_features=8, depth=2,
                      compute_dtype="float32", arch="unetpp")


def test_unetpp_forward_contract():
    model = UNetPP(PP_SMALL)
    x = jnp.zeros((2, 64, 64, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 64, 64, 1)
    assert y.dtype == jnp.float32
    # nested grid: every X[i][j] with i + j <= depth exists
    names = set(variables["params"].keys())
    for j in range(PP_SMALL.depth + 1):
        for i in range(PP_SMALL.depth + 1 - j):
            assert f"x_{i}_{j}" in names, (i, j)
    assert "head" in names


def test_unetpp_denser_than_unet():
    """The nested decoder must add parameters over the plain U-Net at the
    same base/depth (sanity that the dense skips are actually wired)."""
    x = jnp.zeros((1, 32, 32, 2))
    n, mods = {}, {}
    for arch, cls in (("unet", UNet), ("unetpp", UNetPP)):
        cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                         compute_dtype="float32", arch=arch)
        v = cls(cfg).init(jax.random.PRNGKey(0), x, train=False)
        n[arch] = sum(p.size for p in jax.tree.leaves(v["params"]))
        mods[arch] = len(v["params"])
    # at depth d the nested decoder adds d·(d+1)/2 − d extra double-conv
    # nodes (all at SHALLOW scales, so the param delta is modest — the
    # deepest level dominates parameter mass; the structural delta is the
    # meaningful check)
    assert n["unetpp"] > n["unet"]
    assert mods["unetpp"] > mods["unet"]


def test_unetpp_deep_supervision_shape():
    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="float32", arch="unetpp",
                     deep_supervision=True)
    model = UNetPP(cfg)
    x = jnp.zeros((1, 32, 32, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 32, 32, 1)
    names = set(variables["params"].keys())
    assert {"head_1", "head_2"} <= names and "head" not in names


def test_build_model_selects_arch():
    assert isinstance(build_model(UNetConfig(arch="unet")), UNet)
    assert isinstance(build_model(UNetConfig(arch="unetpp")), UNetPP)
    with pytest.raises(ValueError, match="arch"):
        build_model(UNetConfig(arch="resnet"))


def test_unetpp_trains_on_tiny_problem():
    """Loss decreases on a tiny overfit problem through the SHARED train
    step (no architecture-specific training code)."""
    from plumekit.train import create_state, make_train_step

    tcfg = TrainConfig(batch_size=4, tile_size=32, total_steps=30,
                       warmup_steps=5, learning_rate=3e-3, augment=False)
    state = create_state(jax.random.PRNGKey(0), PP_SMALL, tcfg)
    step = make_train_step(augment=False)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((4, 32, 32, 2), np.float32))
    ys = jnp.zeros((4, 32, 32, 1))
    ys = ys.at[:, 8:24, 8:24, :].set(1.0)
    first = last = None
    for i in range(30):
        state, metrics = step(state, xs, ys, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < 0.5 * first, (first, last)


def test_model_config_persistence_roundtrip(tmp_path):
    """train() persists the architecture; load_model_config rebuilds it —
    the predict/export/evaluate restore contract."""
    from plumekit.train.checkpoint import load_model_config
    from plumekit.train.loop import train

    ck = str(tmp_path / "ckpt")
    train(unet_cfg=PP_SMALL,
          train_cfg=TrainConfig(total_steps=2, batch_size=2, tile_size=32,
                                log_every=0, eval_every=0,
                                checkpoint_dir=ck, checkpoint_every=0),
          data_cfg=DataConfig(granule_size=64, n_train_granules=1,
                              n_eval_granules=1))
    cfg = load_model_config(ck)
    assert cfg == PP_SMALL
    assert load_model_config(str(tmp_path / "nope")) is None


def test_resume_arch_mismatch_refuses_without_clobbering(tmp_path):
    """Resuming a checkpoint dir with a DIFFERENT config must fail loudly
    BEFORE the persisted record is overwritten — a clobbered
    model_config.json would leave the surviving checkpoints unservable
    (the exact mismatch persistence exists to prevent)."""
    import json

    from plumekit.train.loop import train

    ck = str(tmp_path / "ckpt")
    kwargs = dict(
        train_cfg=TrainConfig(total_steps=2, batch_size=2, tile_size=32,
                              log_every=0, eval_every=0, checkpoint_dir=ck,
                              checkpoint_every=2),
        data_cfg=DataConfig(granule_size=64, n_train_granules=1,
                            n_eval_granules=1),
    )
    train(unet_cfg=PP_SMALL, **kwargs)
    with pytest.raises(ValueError, match="matching config"):
        train(unet_cfg=UNetConfig(in_channels=2, base_features=8, depth=2,
                                  compute_dtype="float32"), **kwargs)
    record = json.load(open(os.path.join(ck, "model_config.json")))
    assert record["arch"] == "unetpp"  # untouched


def test_deep_supervision_requires_unetpp():
    with pytest.raises(ValueError, match="deep_supervision"):
        build_model(UNetConfig(deep_supervision=True))  # default arch=unet


def test_writer_sweep_removes_file_tmps(tmp_path):
    """An orphaned model_config.json.tmp (file, not dir) must be reaped by
    the writer-side sweep — rmtree silently no-ops on files."""
    from plumekit.train.checkpoint import _drop_partial_tmps

    orphan = tmp_path / "model_config.json.tmp"
    orphan.write_text("{}")
    _drop_partial_tmps(str(tmp_path))
    assert not orphan.exists()


def test_unetpp_cli_train_then_predict(tmp_path):
    """--arch unetpp end-to-end: predict must rebuild UNet++ from the
    persisted record (restoring through a UNet skeleton would fail)."""
    from plumekit.cli import main

    root = str(tmp_path)
    assert main(["make_dataset", "--root", root, "--n-granules", "1",
                 "--size", "128"]) == 0
    assert main(["train_model", "--root", root, "--steps", "2",
                 "--batch-size", "2", "--tile", "32",
                 "--granule-size", "64", "--arch", "unetpp"]) == 0
    assert os.path.exists(os.path.join(root, "models", "checkpoints",
                                       "model_config.json"))
    assert main(["predict_model", "--root", root, "--tile", "64"]) == 0
    preds = os.listdir(os.path.join(root, "processed", "predictions"))
    assert preds
    # the fused Pallas forward is unet-only: clear error, not a crash
    assert main(["predict_model", "--root", root, "--tile", "64",
                 "--fused"]) == 1
