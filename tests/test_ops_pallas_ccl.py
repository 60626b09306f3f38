"""Parity tests for the multi-threshold CCL Pallas kernel (interpret mode on
CPU; the TPU-compiled path is exercised by experiments/ccl_timing.py and the
identify benchmarks — same program, Mosaic-lowered).

Every case compares bit-exactly against :func:`ops.ccl.connected_components`
(itself scipy-oracle-tested), including the percolation regime that exposed
the window-edge wrap leak during bring-up.
"""

from __future__ import annotations

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from plumekit.ops.ccl import connected_components
from plumekit.ops.pallas.ccl_sweep import multi_threshold_ccl


def _nested_stack(seed: int, shape, quantiles, smooth=1.0):
    rng = np.random.default_rng(seed)
    field = ndimage.gaussian_filter(
        rng.random(shape).astype(np.float32), smooth
    )
    ths = np.quantile(field, quantiles)
    stack = np.stack([field > t for t in ths])
    for i in range(len(ths) - 1):
        assert (stack[i] <= stack[i + 1]).all()
    return stack


@pytest.mark.parametrize("connectivity", [1, 2])
def test_kernel_matches_xla_nested_noise(connectivity):
    opened = _nested_stack(3, (160, 200), [0.9, 0.5, 0.2])
    got = np.asarray(multi_threshold_ccl(jnp.asarray(opened), block=32,
                                         connectivity=connectivity,
                                         interpret=True))
    for i in range(opened.shape[0]):
        ref = np.asarray(connected_components(jnp.asarray(opened[i]),
                                              connectivity=connectivity))
        np.testing.assert_array_equal(got[i], ref)


def test_kernel_percolation_regime_multiblock():
    """fg≈0.5 maze masks across several row blocks — the case where a
    window-edge wrap leak merges distinct components."""
    opened = _nested_stack(7, (96, 130), [0.7, 0.45, 0.25], smooth=0.8)
    got = np.asarray(multi_threshold_ccl(jnp.asarray(opened), block=16,
                                         interpret=True))
    for i in range(3):
        ref = np.asarray(connected_components(jnp.asarray(opened[i]),
                                              connectivity=2))
        np.testing.assert_array_equal(got[i], ref)


def test_kernel_edge_masks():
    """Degenerate levels: empty, full, single pixels at corners, and a
    width that is an exact lane multiple (wrap fixes have no padding)."""
    h, w = 40, 128  # w == w_pad: lane wrap would connect row ends
    empty = np.zeros((h, w), bool)
    full = np.ones((h, w), bool)
    corners = np.zeros((h, w), bool)
    corners[0, 0] = corners[0, -1] = corners[-1, 0] = corners[-1, -1] = True
    stack = np.stack([empty, corners, corners | (np.arange(w) % 2 == 0),
                      full])
    # NB: stack is nested: empty ⊆ corners ⊆ corners|stripes ⊆ full
    got = np.asarray(multi_threshold_ccl(jnp.asarray(stack), block=8,
                                         interpret=True))
    for i in range(4):
        ref = np.asarray(connected_components(jnp.asarray(stack[i]),
                                              connectivity=2))
        np.testing.assert_array_equal(got[i], ref)


def test_kernel_non_nested_flag():
    """nested=False labels arbitrary (non-nested) stacks correctly."""
    rng = np.random.default_rng(0)
    stack = rng.random((3, 48, 72)) > 0.6  # independent masks
    got = np.asarray(multi_threshold_ccl(jnp.asarray(stack), block=16,
                                         nested=False, interpret=True))
    for i in range(3):
        ref = np.asarray(connected_components(jnp.asarray(stack[i]),
                                              connectivity=2))
        np.testing.assert_array_equal(got[i], ref)


def test_pipeline_xla_fallback_env(monkeypatch):
    """PLUMEKIT_CCL=xla forces the scan path (escape hatch)."""
    from plumekit.ops.ccl import ccl_backend

    monkeypatch.setenv("PLUMEKIT_CCL", "xla")
    assert ccl_backend() == "xla"
