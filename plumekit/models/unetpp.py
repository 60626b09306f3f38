"""UNet++ — nested dense-skip segmentation model (second architecture
family; PAPERS.md: Zhou et al., "UNet++: A Nested U-Net Architecture for
Medical Image Segmentation", arXiv:1807.10165).

The reference promises "a unet based classifier" and ships none
(``README.md:1-4``, empty ``src/models/``); plumekit supplies the U-Net
(``models/unet.py``) and this denser variant. The grid of nodes
``X[i][j]`` (row i = scale 1/2^i, column j = fusion depth) redefines each
skip as a dense pathway: ``X[i][j]`` fuses ALL previous same-scale nodes
``X[i][0..j-1]`` plus the upsampled ``X[i+1][j-1]``. Column d's top node
is the output head; with ``deep_supervision`` the side heads on
``X[0][1..d]`` are averaged (the paper's pruning/ensembling mode).

TPU notes: identical kernel vocabulary to the U-Net (3×3 convs, 2×2
pools, stride-2 transposed convs, concats) in NHWC bf16 — XLA fuses it
the same way; only the wiring is denser. The logits contract
``(B, H, W, out_channels) float32`` matches UNet exactly, so the train
step, sliding-window inference, AOT export, and evaluation all work
unchanged (``create_state`` selects the class from ``UNetConfig.arch``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from plumekit.config.train import UNetConfig
from plumekit.models.unet import DoubleConv, _dtype_of


class UNetPP(nn.Module):
    """Configurable-depth UNet++ over NHWC tensors. H and W must divide by
    ``2**depth`` (same constraint as UNet)."""

    cfg: UNetConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dtype: Any = _dtype_of(cfg.compute_dtype)
        x = x.astype(dtype)
        # serving-time pruning (the paper's §5 "model pruning"): head j
        # only reads nodes X[i][k] with i+k ≤ j, so truncating every loop
        # at L drops the deeper columns AND the deeper encoder levels
        # entirely. Module names are unchanged, so the full checkpoint's
        # params apply (flax ignores the unused subtrees); L = depth is
        # bit-identical to the untruncated model.
        level = effective_level(cfg)

        def block(feats, name):
            return DoubleConv(feats, cfg.norm, dtype,
                              cfg.group_norm_groups, self.axis_name,
                              name=name)

        feats = [cfg.base_features * (1 << i) for i in range(level + 1)]
        # encoder backbone: column 0 (X[i][0] at scale 1/2^i)
        grid = {}
        h = x
        for i in range(level + 1):
            if i:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = block(feats[i], f"x_{i}_0")(h, train)
            grid[(i, 0)] = h

        # nested dense decoder: X[i][j] = block(concat(X[i][0..j-1],
        # up(X[i+1][j-1])))
        for j in range(1, level + 1):
            for i in range(level + 1 - j):
                up = nn.ConvTranspose(feats[i], (2, 2), strides=(2, 2),
                                      dtype=dtype,
                                      name=f"up_{i}_{j}")(grid[(i + 1, j - 1)])
                cat = jnp.concatenate(
                    [grid[(i, k)] for k in range(j)] + [up], axis=-1)
                grid[(i, j)] = block(feats[i], f"x_{i}_{j}")(cat, train)

        def head(node, name):
            return nn.Conv(cfg.out_channels, (1, 1), dtype=jnp.float32,
                           name=name)(node.astype(jnp.float32))

        if cfg.deep_supervision:
            # the paper's deep supervision: every top-row column gets a
            # side head; serve the average (columns stay individually
            # trainable, and the mean keeps the single-logits contract)
            outs = [head(grid[(0, j)], f"head_{j}")
                    for j in range(1, level + 1)]
            return sum(outs) / len(outs)
        return head(grid[(0, level)], "head")


def effective_level(cfg: UNetConfig) -> int:
    """The fusion column the forward tops out at: ``prune_level`` when set
    (validated — UNet++ with deep supervision only, 1 ≤ L ≤ depth), else
    ``depth``. Also the effective DOWNSAMPLING depth of the pruned net:
    inputs need only divide by ``2**level``, and the sharded-inference halo
    radius is ``receptive_field(level)``."""
    if cfg.prune_level is None:
        return cfg.depth
    if cfg.arch != "unetpp" or not cfg.deep_supervision:
        raise ValueError(
            "prune_level is a serving-time mode of the deep-supervised "
            "UNet++ (side heads on every fusion column are what make the "
            f"truncated grid servable); arch={cfg.arch!r} "
            f"deep_supervision={cfg.deep_supervision}")
    if not 1 <= cfg.prune_level <= cfg.depth:
        raise ValueError(
            f"prune_level must be in [1, depth={cfg.depth}], "
            f"got {cfg.prune_level}")
    return cfg.prune_level


def build_model(cfg: UNetConfig, axis_name: Optional[str] = None):
    """The one place ``UNetConfig.arch`` is resolved to a module — every
    consumer (create_state, CLI restore, exports) selects through here so
    an architecture mismatch between train and serve cannot happen
    silently."""
    if cfg.deep_supervision and cfg.arch != "unetpp":
        raise ValueError(
            "deep_supervision is a UNet++ mode (side heads on the nested "
            f"top-row columns); arch is {cfg.arch!r} — a silently ignored "
            "flag would also be persisted into model_config.json")
    effective_level(cfg)  # validate prune_level against arch/ds/depth
    if cfg.arch == "unetpp":
        return UNetPP(cfg, axis_name=axis_name)
    if cfg.arch == "unet":
        from plumekit.models.unet import UNet

        return UNet(cfg, axis_name=axis_name)
    raise ValueError(f"unknown UNetConfig.arch {cfg.arch!r} "
                     "(expected 'unet' or 'unetpp')")
