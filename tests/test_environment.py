"""Environment check — the reference's only test asserted the interpreter
major version (``test_environment.py:1-25``, targeting Python 2!). plumekit
asserts the runtime it actually needs."""

import sys


def test_python_version():
    assert sys.version_info >= (3, 10), "plumekit requires Python >= 3.10"


def test_core_dependencies_importable():
    import jax  # noqa: F401
    import flax  # noqa: F401
    import optax  # noqa: F401
    import numpy  # noqa: F401
    import scipy  # noqa: F401
    import pandas  # noqa: F401

    import plumekit

    assert plumekit.__version__


def test_virtual_device_mesh_available():
    import jax

    assert len(jax.devices()) >= 8, (
        "tests expect XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "(set by conftest)"
    )
