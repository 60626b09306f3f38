"""checkify numerics-guard wrapper."""

import jax.numpy as jnp
import pytest

from plumekit.utils.debugging import checked


def test_checked_passes_clean_fn():
    f = checked(lambda x: x * 2 + 1)
    assert float(f(jnp.float32(3.0))) == 7.0


def test_checked_catches_nan():
    from jax.experimental import checkify

    f = checked(lambda x: jnp.log(x) / jnp.log(x))
    with pytest.raises(checkify.JaxRuntimeError):
        f(jnp.float32(-1.0))  # log(-1) = nan
