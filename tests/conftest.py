"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding (DP psum, halo exchange, stitching) is exercised without a pod
(SURVEY.md §4 point 4). Must run before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_scene():
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    return make_scene(SyntheticSceneConfig(size=256, n_plumes=2, seed=7))
