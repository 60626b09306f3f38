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


# ---------------------------------------------------------------------------
# serving-time pruning (the UNet++ paper's §5 "model pruning" mode)
# ---------------------------------------------------------------------------

PP_DS = UNetConfig(in_channels=2, base_features=8, depth=3,
                   compute_dtype="float32", arch="unetpp",
                   deep_supervision=True)


def _ds_variables(cfg, key=0):
    model = UNetPP(cfg)
    x = jnp.zeros((1, 8 * 2 ** cfg.depth, 8 * 2 ** cfg.depth,
                   cfg.in_channels))
    return model.init(jax.random.PRNGKey(key), x, train=False)


def test_prune_level_at_depth_is_bitexact():
    """L = depth must reproduce the full deep-supervised model exactly —
    pruning only ever REMOVES computation."""
    import dataclasses

    variables = _ds_variables(PP_DS)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 2),
                                                    np.float32))
    full = build_model(PP_DS).apply(variables, x, train=False)
    pruned = build_model(
        dataclasses.replace(PP_DS, prune_level=PP_DS.depth)
    ).apply(variables, x, train=False)
    assert (full == pruned).all()


@pytest.mark.parametrize("level", [1, 2])
def test_prune_level_equals_restricted_depth_model(level):
    """Head j depends only on nodes X[i][k] with i + k <= j, so serving the
    depth-3 checkpoint pruned at L must equal a depth-L UNet++ applied with
    the SAME (full) param dict — the structural claim pruning rests on."""
    import dataclasses

    variables = _ds_variables(PP_DS)
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 2),
                                                    np.float32))
    pruned = build_model(
        dataclasses.replace(PP_DS, prune_level=level)
    ).apply(variables, x, train=False)
    restricted = build_model(
        dataclasses.replace(PP_DS, depth=level, prune_level=None)
    ).apply(variables, x, train=False)
    assert (pruned == restricted).all()


def test_prune_level_validation():
    import dataclasses

    from plumekit.train.loop import train

    for bad in (dict(prune_level=0), dict(prune_level=4),
                dict(arch="unet", deep_supervision=False, prune_level=2),
                dict(deep_supervision=False, prune_level=2)):
        with pytest.raises(ValueError):
            build_model(dataclasses.replace(PP_DS, **bad))
    # training a truncated grid is refused: the persisted config would
    # describe checkpoints that cannot serve the deeper columns
    with pytest.raises(ValueError, match="serving-only"):
        train(unet_cfg=dataclasses.replace(PP_DS, prune_level=1),
              train_cfg=TrainConfig(total_steps=1), checkpoint=False)


def test_prune_level_cli_predict(tmp_path):
    """predict_model --prune-level serves a deep-supervised checkpoint
    truncated; on a non-DS checkpoint the flag must fail with a clear
    usage error, not a half-restored model."""
    from plumekit.cli import main

    root = str(tmp_path)
    assert main(["make_dataset", "--root", root, "--n-granules", "1",
                 "--size", "128"]) == 0
    assert main(["train_model", "--root", root, "--steps", "2",
                 "--batch-size", "2", "--tile", "32",
                 "--granule-size", "64", "--arch", "unetpp",
                 "--deep-supervision"]) == 0
    assert main(["predict_model", "--root", root, "--tile", "64",
                 "--prune-level", "1"]) == 0
    preds = os.listdir(os.path.join(root, "processed", "predictions"))
    assert preds
    # out-of-range level: usage error
    with pytest.raises(SystemExit):
        main(["predict_model", "--root", root, "--tile", "64",
              "--prune-level", "7"])
