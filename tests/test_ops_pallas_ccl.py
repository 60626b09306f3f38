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


def test_kernel_local_iters_and_stats():
    """local_iters > 1 (within-visit scan-direction alternation) reaches
    the same unique fixpoint bit-exactly, and return_stats reports a
    plausible per-level pass count that local alternation can only
    shrink (percolation maze — the stats' reason to exist)."""
    opened = _nested_stack(11, (96, 130), [0.7, 0.45, 0.25], smooth=0.8)
    base, s1 = multi_threshold_ccl(jnp.asarray(opened), block=16,
                                   return_stats=True, interpret=True)
    alt, s2 = multi_threshold_ccl(jnp.asarray(opened), block=16,
                                  local_iters=2, return_stats=True,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(alt))
    for i in range(3):
        ref = np.asarray(connected_components(jnp.asarray(opened[i]),
                                              connectivity=2))
        np.testing.assert_array_equal(np.asarray(base)[i], ref)
    s1, s2 = np.asarray(s1), np.asarray(s2)
    assert s1.shape == (3,) and (s1 >= 1).all()
    assert (s2 <= s1).all()
    with pytest.raises(ValueError, match="local_iters"):
        multi_threshold_ccl(jnp.asarray(opened), local_iters=0,
                            interpret=True)


def test_kernel_serpentine_pointer_jumps():
    """Adversarial serpentine — one component whose min-propagation path
    reverses direction every other row, the worst case for sweep-only
    convergence. The sparse pointer-jump rounds must (a) fire (pass count
    exceeds jump_start), (b) keep labels bit-equal to the XLA op, and
    (c) converge in fewer passes than the jump-disabled kernel."""
    h, w = 96, 256
    snake = np.zeros((h, w), bool)
    snake[::2, :] = True                      # horizontal corridors
    for i in range(0, h - 2, 2):              # alternating end connectors
        col = 0 if (i // 2) % 2 == 0 else w - 1
        snake[i + 1, col] = True
    stack = np.stack([snake, snake | (np.arange(w) % 2 == 0)])
    ref = [np.asarray(connected_components(jnp.asarray(stack[i]),
                                           connectivity=2))
           for i in range(2)]

    got, s_jump = multi_threshold_ccl(jnp.asarray(stack), block=16,
                                      return_stats=True, interpret=True)
    off, s_off = multi_threshold_ccl(jnp.asarray(stack), block=16,
                                     jump_every=0, return_stats=True,
                                     interpret=True)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(got)[i], ref[i])
        np.testing.assert_array_equal(np.asarray(off)[i], ref[i])
    s_jump, s_off = np.asarray(s_jump), np.asarray(s_off)
    assert s_off[0] > 8, "serpentine should exceed jump_start sweeps"
    assert s_jump[0] < s_off[0], (
        f"jumps did not accelerate: {s_jump[0]} vs {s_off[0]}")


def test_pipeline_xla_fallback_env(monkeypatch):
    """PLUMEKIT_CCL=xla forces the scan path (escape hatch)."""
    from plumekit.ops.ccl import ccl_backend

    monkeypatch.setenv("PLUMEKIT_CCL", "xla")
    assert ccl_backend() == "xla"
