"""Model + training tests: U-Net shapes/grads, losses, augmentation, train
step convergence on a tiny problem, DP sharding on the 8-device CPU mesh
(SURVEY.md §4 points 3-4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plumekit.config.train import (
    DataConfig,
    MeshConfig,
    TrainConfig,
    UNetConfig,
)
from plumekit.models import UNet, dice_bce_loss, dice_loss, bce_with_logits, iou
from plumekit.train import (
    augment_batch,
    create_state,
    make_eval_step,
    make_train_step,
    make_synthetic_dataset,
    shard_batch,
    tile_batches,
    scene_to_sample,
)
from plumekit.parallel import make_mesh

SMALL_UNET = UNetConfig(in_channels=2, base_features=8, depth=2,
                        compute_dtype="float32")
SMALL_TRAIN = TrainConfig(batch_size=4, tile_size=32, total_steps=30,
                          warmup_steps=5, learning_rate=3e-3, augment=False)


def test_unet_forward_shapes():
    model = UNet(SMALL_UNET)
    x = jnp.zeros((2, 64, 64, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 64, 64, 1)
    assert y.dtype == jnp.float32


def test_unet_bf16_compute_fp32_params():
    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="bfloat16")
    model = UNet(cfg)
    x = jnp.zeros((1, 32, 32, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    y = model.apply(variables, x, train=False)
    assert y.dtype == jnp.float32  # head promotes to fp32


def test_losses_basic_properties():
    logits = jnp.full((2, 8, 8, 1), 10.0)
    ones = jnp.ones((2, 8, 8, 1))
    zeros = jnp.zeros((2, 8, 8, 1))
    assert float(dice_loss(logits, ones)) < 0.01
    assert float(bce_with_logits(logits, ones)) < 0.01
    assert float(dice_bce_loss(logits, zeros)) > 1.0
    assert float(iou(ones > 0, ones > 0)) == pytest.approx(1.0)
    assert float(iou(zeros > 0.5, ones > 0.5)) < 1e-6


def test_augment_preserves_pairing():
    rng = jax.random.PRNGKey(3)
    xs = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 2)),
                     jnp.float32)
    ys = xs[..., :1]  # labels mirror channel 0
    ax, ay = augment_batch(rng, xs, ys)
    np.testing.assert_allclose(np.asarray(ax[..., :1]), np.asarray(ay))
    # content preserved per sample (same multiset of values)
    np.testing.assert_allclose(
        np.sort(np.asarray(ax).reshape(8, -1)), np.sort(np.asarray(xs).reshape(8, -1))
    )


def test_train_step_learns_single_device():
    state = create_state(jax.random.PRNGKey(0), SMALL_UNET, SMALL_TRAIN)
    step = make_train_step(dice_weight=0.5, augment=False)
    rng = np.random.default_rng(0)
    # trivially learnable: mask = channel0 > 0.5
    xs = rng.random((4, 32, 32, 2)).astype(np.float32)
    ys = (xs[..., :1] > 0.5).astype(np.float32)
    first = None
    for i in range(30):
        state, metrics = step(state, jnp.asarray(xs), jnp.asarray(ys),
                              jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.7, (first, last)
    assert float(metrics["iou"]) > 0.5


def test_train_step_dp_mesh_matches_semantics():
    mesh = make_mesh(MeshConfig(data=8))
    state = create_state(jax.random.PRNGKey(0), SMALL_UNET, SMALL_TRAIN)
    step = make_train_step(dice_weight=0.5, augment=False, mesh=mesh)
    rng = np.random.default_rng(0)
    xs = rng.random((8, 32, 32, 2)).astype(np.float32)
    ys = (xs[..., :1] > 0.5).astype(np.float32)
    sx, sy = shard_batch(mesh, jnp.asarray(xs), jnp.asarray(ys))
    state2, metrics = step(state, sx, sy, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params updated and replicated across devices
    leaf = jax.tree.leaves(state2.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_eval_step_and_data_pipeline():
    data_cfg = DataConfig(granule_size=96, tile_size=32, n_train_granules=1,
                          n_eval_granules=1)
    samples = make_synthetic_dataset(data_cfg, train=True)
    assert samples[0].channels.shape == (96, 96, 2)
    assert set(np.unique(samples[0].mask)).issubset({0.0, 1.0})
    batches = tile_batches(samples, 32, 4, np.random.default_rng(0), steps=3)
    xs, ys = next(batches)
    assert xs.shape == (4, 32, 32, 2) and ys.shape == (4, 32, 32, 1)
    state = create_state(jax.random.PRNGKey(0), SMALL_UNET, SMALL_TRAIN)
    ev = make_eval_step()
    metrics = ev(state, jnp.asarray(xs), jnp.asarray(ys))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    from plumekit.train import save_checkpoint, restore_checkpoint, latest_step

    state = create_state(jax.random.PRNGKey(0), SMALL_UNET, SMALL_TRAIN)
    save_checkpoint(str(tmp_path), state, 7)
    assert latest_step(str(tmp_path)) == 7
    zeroed = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(str(tmp_path), zeroed)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_interrupted_swap_recovers(tmp_path):
    """A crash between the overwrite swap's two renames leaves only
    step_X.tmp + step_X.old.tmp; latest_step must promote the complete new
    checkpoint instead of silently resuming from an older step."""
    import os
    import shutil

    from plumekit.train import save_checkpoint, restore_checkpoint, latest_step

    state = create_state(jax.random.PRNGKey(0), SMALL_UNET, SMALL_TRAIN)
    save_checkpoint(str(tmp_path), state, 3)
    path = os.path.join(str(tmp_path), "step_00000003")

    # simulate the mid-swap crash state: complete tmp, path moved aside
    shutil.copytree(path, path + ".tmp")
    os.rename(path, path + ".old.tmp")
    assert latest_step(str(tmp_path)) == 3          # recovered
    assert os.path.isdir(path)
    assert not os.path.exists(path + ".tmp")
    assert not os.path.exists(path + ".old.tmp")
    zeroed = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(str(tmp_path), zeroed)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))

    # a partial tmp next to an intact checkpoint is AMBIGUOUS from a
    # reader's seat: it may be a live writer's in-flight save, so
    # latest_step (read-safe) must leave it alone — a reader that deleted
    # it could destroy a concurrent trainer's overwrite swap mid-write.
    # Only the writer (the next save_checkpoint) sweeps it.
    os.makedirs(path + ".tmp")
    assert latest_step(str(tmp_path)) == 3
    assert os.path.exists(path + ".tmp")      # reader did not touch it
    save_checkpoint(str(tmp_path), state, 9)  # writer cleans, then saves
    assert not os.path.exists(path + ".tmp")
    assert latest_step(str(tmp_path)) == 9


def test_worklog(tmp_path):
    from plumekit.train import WorkLog

    log = WorkLog(str(tmp_path / "log.txt"))
    assert not log.done("granule_a")
    log.mark("granule_a")
    assert log.done("granule_a")
    assert not log.done("granule")  # exact-line match, not substring


def test_dp_step_matches_single_device():
    """GSPMD data-parallel step must compute the same update as a single
    device given the same global batch (augment off, fp32)."""
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.random((8, 32, 32, 2)).astype(np.float32))
    ys = jnp.asarray((np.asarray(xs)[..., :1] > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)

    state1 = create_state(jax.random.PRNGKey(0), SMALL_UNET, SMALL_TRAIN)
    step1 = make_train_step(dice_weight=0.5, augment=False)
    state1, m1 = step1(state1, xs, ys, key)

    mesh = make_mesh(MeshConfig(data=8))
    state8 = create_state(jax.random.PRNGKey(0), SMALL_UNET, SMALL_TRAIN)
    step8 = make_train_step(dice_weight=0.5, augment=False, mesh=mesh)
    sx, sy = shard_batch(mesh, xs, ys)
    state8 = jax.device_put(
        state8, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    state8, m8 = step8(state8, sx, sy, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    a = jax.tree.leaves(state1.params)
    b = jax.tree.leaves(state8.params)
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)


def test_early_stopping_and_label_smoothing(tmp_path):
    """eval_every tracks a dev curve, keeps the best step, and
    early_stop_patience halts training; label_smooth only softens BCE."""
    import jax.numpy as jnp

    from plumekit.config.train import DataConfig, TrainConfig, UNetConfig
    from plumekit.models.losses import dice_bce_loss
    from plumekit.train.loop import train

    # label smoothing: at eps=0.25 the BCE targets move toward 0.5
    logits = jnp.asarray([[2.0, -2.0]])
    labels = jnp.asarray([[1.0, 0.0]])
    hard = dice_bce_loss(logits, labels, dice_weight=0.0)
    soft = dice_bce_loss(logits, labels, dice_weight=0.0, label_smooth=0.25)
    assert float(soft) > float(hard)  # confident logits get penalised

    hist = train(
        unet_cfg=UNetConfig(base_features=8, depth=2,
                            compute_dtype="float32"),
        train_cfg=TrainConfig(
            total_steps=40, batch_size=2, tile_size=32, log_every=10,
            eval_every=5, early_stop_patience=2, label_smooth=0.05,
            checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=1000,
            learning_rate=0.0,  # frozen model -> dev IoU can never improve
        ),
        data_cfg=DataConfig(granule_size=64, n_train_granules=1,
                            n_eval_granules=1),
        checkpoint=False,
    )
    # patience 2 with a frozen model: first eval sets best, next two miss
    assert len(hist["eval_steps"]) == 3
    assert hist["best_dev_step"] == [5.0]
    assert hist["eval_iou"]  # final eval still reported


def test_short_train_always_saves_final_checkpoint(tmp_path):
    """A run shorter than both checkpoint_every and eval_every must still
    persist its final weights: predict_model restores latest_step and would
    otherwise silently serve an untrained net (round-3 verify-drive find)."""
    from plumekit.config.train import DataConfig, TrainConfig, UNetConfig
    from plumekit.train.checkpoint import latest_step
    from plumekit.train.loop import train

    ckpt = str(tmp_path / "ckpt")
    train(
        unet_cfg=UNetConfig(base_features=8, depth=2,
                            compute_dtype="float32"),
        train_cfg=TrainConfig(
            total_steps=3, batch_size=2, tile_size=32, log_every=10,
            eval_every=0, checkpoint_dir=ckpt, checkpoint_every=1000,
        ),
        data_cfg=DataConfig(granule_size=64, n_train_granules=1,
                            n_eval_granules=1),
    )
    assert latest_step(ckpt) == 3


def test_early_stop_checkpoint_is_self_consistent(tmp_path):
    """Early stopping must leave latest_step == best_step with the restored
    TrainState.step matching the directory name (the peak saved under the
    stop step broke resume: data/keys reseeded at stop while params and the
    optax schedule sat at the peak), and the degraded post-peak interval
    checkpoints pruned."""
    import os

    from plumekit.config.train import DataConfig, TrainConfig, UNetConfig
    from plumekit.train.checkpoint import latest_step, restore_checkpoint
    from plumekit.train.loop import train
    from plumekit.train.state import create_state

    ckpt = str(tmp_path / "ckpt")
    unet = UNetConfig(base_features=8, depth=2, compute_dtype="float32")
    tcfg = TrainConfig(
        total_steps=40, batch_size=2, tile_size=32, log_every=10,
        eval_every=5, early_stop_patience=2, checkpoint_dir=ckpt,
        checkpoint_every=10, learning_rate=0.0,  # frozen: best at step 5
    )
    train(unet_cfg=unet, train_cfg=tcfg,
          data_cfg=DataConfig(granule_size=64, n_train_granules=1,
                              n_eval_granules=1))
    # frozen model: first eval (step 5) is best; stop at step 15; the
    # step-10 interval checkpoint must be pruned
    assert latest_step(ckpt) == 5
    assert sorted(os.listdir(ckpt)) == ["model_config.json",
                                        "step_00000005"]
    target = create_state(jax.random.PRNGKey(0), unet, tcfg)
    restored = restore_checkpoint(ckpt, jax.tree.map(jnp.zeros_like, target))
    assert int(restored.step) == 5


def test_worklog_no_substring_false_positive(tmp_path):
    """'plume.npz' must not be reported done after 'big_plume.npz' was
    logged (exact line membership, not substring containment)."""
    from plumekit.train import WorkLog

    log = WorkLog(str(tmp_path / "log.txt"))
    log.mark("big_plume.npz")
    assert log.done("big_plume.npz")
    assert not log.done("plume.npz")


def test_log_every_zero_disables_logging(tmp_path):
    """log_every=0 / checkpoint_every=0 must disable those intervals, not
    ZeroDivisionError on the first step (the eval_every=0 convention)."""
    from plumekit.config.train import DataConfig, TrainConfig, UNetConfig
    from plumekit.train.loop import train

    hist = train(
        unet_cfg=UNetConfig(base_features=8, depth=2,
                            compute_dtype="float32"),
        train_cfg=TrainConfig(total_steps=2, batch_size=2, tile_size=32,
                              log_every=0, eval_every=0,
                              checkpoint_dir=str(tmp_path / "c"),
                              checkpoint_every=0),
        data_cfg=DataConfig(granule_size=64, n_train_granules=1,
                            n_eval_granules=1),
        checkpoint=False,
    )
    assert hist["loss"] == []  # nothing logged, nothing crashed


def test_steps_per_dispatch_matches_single_step():
    """K optimizer steps scanned in one program (steps_per_dispatch) must be
    equivalent to K single-step calls: same data order, same per-step
    fold_in keys, same optimizer math (round-3 dispatch-amortisation
    lever applied to training); tolerance covers compile-order float
    reassociation between the two programs."""
    from plumekit.config.train import DataConfig, TrainConfig, UNetConfig
    from plumekit.train.loop import train

    common = dict(
        unet_cfg=UNetConfig(base_features=8, depth=2,
                            compute_dtype="float32"),
        data_cfg=DataConfig(granule_size=64, n_train_granules=1,
                            n_eval_granules=1),
        checkpoint=False,
    )
    cfg = dict(total_steps=10, batch_size=2, tile_size=32, log_every=5,
               eval_every=0)
    h1 = train(train_cfg=TrainConfig(**cfg, steps_per_dispatch=1), **common)
    h3 = train(train_cfg=TrainConfig(**cfg, steps_per_dispatch=3), **common)
    # chunks: 3,2 | 3,2 (log boundary at 5) — logged metrics at steps 5, 10.
    # Same math/data/keys; the scanned program may fuse reductions in a
    # different order, so equality is to float tolerance, not bitwise
    np.testing.assert_allclose(h1["loss"], h3["loss"], rtol=1e-4)
    np.testing.assert_allclose(h1["iou"], h3["iou"], rtol=1e-4)
    np.testing.assert_allclose(h1["eval_iou"], h3["eval_iou"], rtol=1e-4)


def test_multi_step_dp_mesh_executes():
    """The scanned multi-step program composes with GSPMD DP: (K, B, ...)
    batches sharded over data on axis 1, params replicated, finite loss."""
    from plumekit.train.step import make_multi_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(MeshConfig(data=8))
    state = create_state(jax.random.PRNGKey(0), SMALL_UNET, SMALL_TRAIN)
    multi = make_multi_train_step(dice_weight=0.5, augment=True, mesh=mesh,
                                  base_rng=jax.random.PRNGKey(7))
    rng = np.random.default_rng(0)
    xs = rng.random((3, 8, 32, 32, 2)).astype(np.float32)
    ys = (xs[..., :1] > 0.5).astype(np.float32)
    sh = NamedSharding(mesh, P(None, "data"))
    sx = jax.device_put(jnp.asarray(xs), sh)
    sy = jax.device_put(jnp.asarray(ys), sh)
    state2, metrics = multi(state, sx, sy, jnp.arange(3))
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree.leaves(state2.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_groupnorm_non_divisible_channels():
    """GroupNorm must handle channel counts not divisible by the group
    default (12 % 8 != 0 used to crash flax at init)."""
    cfg = UNetConfig(in_channels=2, base_features=12, depth=1,
                     norm="group", compute_dtype="float32")
    model = UNet(cfg)
    x = jnp.zeros((1, 16, 16, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 16, 16, 1)
