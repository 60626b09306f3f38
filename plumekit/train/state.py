"""Train state: params (fp32 masters), batch stats, optax optimiser.

TPU-first choices (BASELINE.json config 4): bf16 activations via the model's
compute dtype, fp32 parameters and optimiser moments, adamw + cosine schedule
with linear warmup.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from plumekit.config.train import TrainConfig, UNetConfig
from plumekit.models.unetpp import build_model


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_schedule(cfg: TrainConfig):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=cfg.learning_rate * 0.05,
    )


def create_state(
    rng: jax.Array,
    unet_cfg: UNetConfig,
    train_cfg: TrainConfig,
    sample_shape=None,
    axis_name: Optional[str] = None,
) -> TrainState:
    """Initialise model + optimiser. ``sample_shape`` defaults to one
    (1, tile, tile, in_channels) tile."""
    model = build_model(unet_cfg, axis_name=axis_name)
    if sample_shape is None:
        sample_shape = (1, train_cfg.tile_size, train_cfg.tile_size,
                        unet_cfg.in_channels)
    variables = model.init(rng, jnp.zeros(sample_shape, jnp.float32),
                           train=False)
    tx = optax.adamw(make_schedule(train_cfg),
                     weight_decay=train_cfg.weight_decay)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )
