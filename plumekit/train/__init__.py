"""Training stack: data tiles, train state, jit/GSPMD steps, checkpoints."""

from plumekit.train.state import TrainState, create_state
from plumekit.train.step import make_train_step, make_eval_step, shard_batch
from plumekit.train.data import (
    make_synthetic_dataset,
    make_weak_label_dataset,
    tile_batches,
    scene_to_sample,
    fire_channel,
)
from plumekit.train.augment import augment_batch
from plumekit.train.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_step,
    WorkLog,
)
from plumekit.train.loop import train

__all__ = [
    "TrainState", "create_state", "make_train_step", "make_eval_step",
    "shard_batch", "make_synthetic_dataset", "make_weak_label_dataset", "tile_batches",
    "scene_to_sample", "fire_channel", "augment_batch", "save_checkpoint",
    "restore_checkpoint", "latest_step", "WorkLog", "train",
]
