"""Pallas fused conv+BN+ReLU vs the lax.conv oracle (interpret mode on CPU;
SURVEY.md §7 hard part #2 numerics story)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plumekit.models.pallas.fused_conv import (
    conv3x3_bn_relu_xla,
    fold_batchnorm,
    fused_conv3x3_bn_relu,
)


@pytest.mark.parametrize("cin,cout", [(2, 8), (8, 16)])
def test_fused_conv_matches_xla(rng, cin, cout):
    x = jnp.asarray(rng.normal(size=(2, 16, 24, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                    * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, cout).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)

    ref = conv3x3_bn_relu_xla(x, w, scale, shift)
    got = fused_conv3x3_bn_relu(x, w, scale, shift, tile_rows=8,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_bf16(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 8)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.bfloat16)
    scale = jnp.ones(8, jnp.bfloat16)
    shift = jnp.zeros(8, jnp.bfloat16)
    ref = conv3x3_bn_relu_xla(x, w, scale, shift)
    got = fused_conv3x3_bn_relu(x, w, scale, shift, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fold_batchnorm_matches_flax_inference(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    bn = nn.BatchNorm(use_running_average=True)
    variables = bn.init(jax.random.PRNGKey(0), x)
    # nontrivial stats
    variables = {
        "params": {
            "scale": jnp.asarray(rng.uniform(0.5, 2, 4), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=4), jnp.float32),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.normal(size=4), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2, 4), jnp.float32),
        },
    }
    ref = bn.apply(variables, x)
    scale, shift = fold_batchnorm(
        variables["params"]["scale"], variables["params"]["bias"],
        variables["batch_stats"]["mean"], variables["batch_stats"]["var"],
    )
    np.testing.assert_allclose(np.asarray(x * scale + shift), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_odd_height_tiles_down(rng):
    # H=10 forces the tile size down to 2; kernel must still be exact
    x = jnp.asarray(rng.normal(size=(1, 10, 16, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32) * 0.1)
    ref = conv3x3_bn_relu_xla(x, w, jnp.ones(4), jnp.zeros(4))
    got = fused_conv3x3_bn_relu(x, w, jnp.ones(4), jnp.zeros(4),
                                tile_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cm,co,tm", [
    ((1, 16, 24, 4), 8, 8, 8),
    ((2, 32, 40, 6), 12, 10, 16),
    ((1, 10, 16, 4), 8, 4, 8),     # odd H -> tile shrink
])
def test_fused_double_conv_matches_chained_xla(rng, shape, cm, co, tm):
    from plumekit.models.pallas.fused_conv import fused_double_conv3x3_bn_relu

    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, shape[-1], cm)).astype(np.float32)
                     * 0.1)
    w2 = jnp.asarray(rng.normal(size=(3, 3, cm, co)).astype(np.float32) * 0.1)
    s1 = jnp.asarray(rng.uniform(0.5, 2, cm).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=cm).astype(np.float32) * 0.1)
    s2 = jnp.asarray(rng.uniform(0.5, 2, co).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=co).astype(np.float32) * 0.1)
    got = fused_double_conv3x3_bn_relu(x, w1, s1, b1, w2, s2, b2,
                                       tile_rows=tm, interpret=True)
    ref = conv3x3_bn_relu_xla(conv3x3_bn_relu_xla(x, w1, s1, b1), w2, s2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_fallback_dispatch(rng):
    # shallow channels on the compiled path dispatch to the XLA fallback —
    # results must match the oracle bit-for-bit (it IS the oracle)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 8)).astype(np.float32) * 0.1)
    got = fused_conv3x3_bn_relu(x, w, jnp.ones(8), jnp.zeros(8))
    ref = conv3x3_bn_relu_xla(x, w, jnp.ones(8), jnp.zeros(8))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
