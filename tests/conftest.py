"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding (DP psum, halo exchange, stitching) is exercised without a pod
(SURVEY.md §4 point 4). Must run before the first ``import jax``.
"""

import os

# force CPU: the session environment pins JAX_PLATFORMS to the tunneled TPU
# ("axon"), but tests must run on 8 virtual CPU devices
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the container's sitecustomize registers the tunneled-TPU ("axon") PJRT
# backend programmatically, which wins over the env var — override in-process
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: identify-pipeline compiles take minutes on a
# single-CPU host; cache them across pytest runs
# separate cache from TPU runs: the tunnel's remote compiler writes AOT
# entries for a different host CPU (feature-mismatch SIGILL risk if shared)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_scene():
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    return make_scene(SyntheticSceneConfig(size=256, n_plumes=2, seed=7))
