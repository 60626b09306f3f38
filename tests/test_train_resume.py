"""Checkpoint/resume of the training loop with deterministic data order."""

import numpy as np
import pytest

from plumekit.config.train import DataConfig, TrainConfig, UNetConfig


SMALL_UNET = UNetConfig(in_channels=2, base_features=8, depth=2,
                        compute_dtype="float32")
DATA = DataConfig(granule_size=96, tile_size=32, n_train_granules=1,
                  n_eval_granules=1)


def _cfg(tmp, steps):
    return TrainConfig(batch_size=2, tile_size=32, total_steps=steps,
                       warmup_steps=2, checkpoint_every=4, log_every=4,
                       checkpoint_dir=str(tmp / "ckpt"), augment=False)


def test_train_resumes_from_checkpoint(tmp_path):
    from plumekit.train.checkpoint import latest_step
    from plumekit.train.loop import train

    # run 8 steps (two checkpoints), then "crash" and rerun to 12
    train(SMALL_UNET, _cfg(tmp_path, 8), DATA)
    assert latest_step(str(tmp_path / "ckpt")) == 8
    hist = train(SMALL_UNET, _cfg(tmp_path, 12), DATA)
    assert latest_step(str(tmp_path / "ckpt")) == 12
    assert np.isfinite(hist["eval_iou"][-1])


def test_train_noop_when_complete(tmp_path):
    from plumekit.train.checkpoint import latest_step
    from plumekit.train.loop import train

    train(SMALL_UNET, _cfg(tmp_path, 4), DATA)
    # rerunning with the same target: resumes at 4 and trains nothing more
    hist = train(SMALL_UNET, _cfg(tmp_path, 4), DATA)
    assert latest_step(str(tmp_path / "ckpt")) == 4
    assert hist["eval_iou"]
