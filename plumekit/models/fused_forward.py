"""Fused-kernel inference forward for the U-Net.

Consumes the exact variable tree produced by :class:`plumekit.models.UNet`
(batch-norm variant) and replays the architecture with the Pallas fused
conv+BN+ReLU kernel (:mod:`plumekit.models.pallas.fused_conv`) at every
double-conv tap. Deep levels (channels multiple of 128) run on the Pallas
kernel (~2× XLA's conv on v5e); shallow levels auto-fall back to the fused
XLA path. Inference only (running statistics, no autodiff).

Structural ops stay in XLA where it is already optimal: 2×2 max-pool as a
reshape-max, 2×2-stride-2 transposed conv as one einsum + pixel-shuffle
interleave (a pure matmul formulation that keeps the MXU busy instead of a
gradient-style conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from plumekit.config.train import UNetConfig
from plumekit.models.pallas.fused_conv import (
    fold_batchnorm,
    fused_double_conv3x3_bn_relu,
)


def _tpu_backend() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def _double_conv(x, params, stats, *, interpret: bool):
    folded = []
    for j in (0, 1):
        bn_p = params[f"_Norm_{j}"]["BatchNorm_0"]
        bn_s = stats[f"_Norm_{j}"]["BatchNorm_0"]
        scale, shift = fold_batchnorm(
            bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"]
        )
        folded.append(
            (params[f"Conv_{j}"]["kernel"].astype(x.dtype),
             scale.astype(x.dtype), shift.astype(x.dtype))
        )
    (w1, s1, b1), (w2, s2, b2) = folded
    # one Pallas program per block (one HBM round-trip for both taps);
    # auto-falls back to chained XLA taps at shallow channel counts
    return fused_double_conv3x3_bn_relu(
        x, w1, s1, b1, w2, s2, b2, interpret=interpret
    )


def _max_pool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _conv_transpose2(x, kernel, bias):
    """2×2 stride-2 transposed conv as matmul + pixel shuffle.

    kernel: (2, 2, Cin, Cout) (flax ConvTranspose HWIO). Each input pixel
    produces a 2×2 output patch; flax's conv_transpose applies the kernel
    *flipped* relative to the patch layout (verified against
    nn.ConvTranspose), so: out[2i+di, 2j+dj] = x[i, j] @ k[1−di, 1−dj].
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    y = jnp.einsum("bhwc,ijco->bhwijo", x,
                   kernel[::-1, ::-1].astype(x.dtype))
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)
    return y + bias.astype(x.dtype)


def make_fused_apply(cfg: UNetConfig):
    """Returns ``apply(variables, x, train=False) -> logits`` mirroring
    ``UNet.apply`` inference semantics with fused kernels. Requires
    ``cfg.norm == 'batch'``."""
    if cfg.norm != "batch":
        raise ValueError("fused forward requires the batch-norm U-Net")
    depth = cfg.depth
    from plumekit.models.unet import _dtype_of

    dtype = _dtype_of(cfg.compute_dtype)

    def apply(variables, x, train: bool = False):
        if train:
            raise ValueError("fused forward is inference-only")
        params = variables["params"]
        stats = variables["batch_stats"]
        interpret = not _tpu_backend()

        x = x.astype(dtype)
        skips = []
        idx = 0
        for _ in range(depth):
            x = _double_conv(x, params[f"DoubleConv_{idx}"],
                             stats[f"DoubleConv_{idx}"], interpret=interpret)
            skips.append(x)
            x = _max_pool2(x)
            idx += 1
        x = _double_conv(x, params[f"DoubleConv_{idx}"],
                         stats[f"DoubleConv_{idx}"], interpret=interpret)
        idx += 1

        for u, skip in enumerate(reversed(skips)):
            ct = params[f"ConvTranspose_{u}"]
            x = _conv_transpose2(x, ct["kernel"], ct["bias"])
            x = jnp.concatenate([skip, x], axis=-1)
            x = _double_conv(x, params[f"DoubleConv_{idx}"],
                             stats[f"DoubleConv_{idx}"], interpret=interpret)
            idx += 1

        head = params["head"]
        logits = (
            jnp.einsum("bhwc,co->bhwo", x.astype(jnp.float32),
                       head["kernel"][0, 0].astype(jnp.float32))
            + head["bias"].astype(jnp.float32)
        )
        return logits

    return apply
