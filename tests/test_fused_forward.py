"""Fused U-Net inference forward vs the flax reference apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plumekit.config.train import UNetConfig
from plumekit.models import UNet
from plumekit.models.fused_forward import make_fused_apply


def test_fused_forward_matches_flax():
    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="float32", norm="batch")
    model = UNet(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # nontrivial batch stats
    variables = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        if a.ndim == 1 else a,
        variables,
    )
    ref = model.apply(variables, x, train=False)
    fused = make_fused_apply(cfg)
    got = fused(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_forward_rejects_train_and_groupnorm():
    cfg = UNetConfig(in_channels=2, base_features=8, depth=1, norm="group")
    with pytest.raises(ValueError, match="batch-norm"):
        make_fused_apply(cfg)
    cfg2 = UNetConfig(in_channels=2, base_features=8, depth=1,
                      compute_dtype="float32")
    model = UNet(cfg2)
    x = jnp.zeros((1, 16, 16, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fused = make_fused_apply(cfg2)
    with pytest.raises(ValueError, match="inference-only"):
        fused(variables, x, train=True)
