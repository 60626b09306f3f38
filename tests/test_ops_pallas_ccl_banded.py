"""Banded (HBM-label-plane) multi-threshold CCL kernel with in-kernel
mask+opening (ops/pallas/ccl_banded.py): interpret-mode bit-parity
against the XLA path — thresholding, cross opening, AND labels — plus
cross-checks against the VMEM-resident kernel. The on-chip path is
covered by the TPU gate (tests/test_tpu_only.py)."""

from __future__ import annotations

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from plumekit.ops.ccl import connected_components
from plumekit.ops.morphology import binary_opening_cross
from plumekit.ops.pallas.ccl_banded import multi_threshold_ccl_banded
from plumekit.ops.pallas.ccl_sweep import multi_threshold_ccl


def _field(seed, shape, smooth=1.0):
    rng = np.random.default_rng(seed)
    return ndimage.gaussian_filter(rng.random(shape).astype(np.float32),
                                   smooth)


def _xla_labels(field, ths):
    masks = jnp.asarray(field)[None] > jnp.asarray(ths)[:, None, None]
    opened = binary_opening_cross(masks)
    return np.stack([
        np.asarray(connected_components(opened[i], connectivity=2))
        for i in range(len(ths))]), np.asarray(opened)


@pytest.mark.parametrize("shape,block", [((160, 200), 32), ((96, 130), 16),
                                         ((40, 128), 8)])
def test_banded_matches_xla(shape, block):
    field = _field(3, shape)
    ths = np.quantile(field, [0.9, 0.5, 0.2]).astype(np.float32)
    got = np.asarray(multi_threshold_ccl_banded(
        jnp.asarray(field), jnp.asarray(ths), block=block, interpret=True))
    ref, _ = _xla_labels(field, ths)
    np.testing.assert_array_equal(got, ref)


def test_banded_percolation_and_vs_resident():
    """Near-percolation maze: banded == XLA == resident kernel (the
    resident kernel consumes the opened stack; the banded one builds it
    in-kernel — both must land on identical labels)."""
    field = _field(7, (96, 130), smooth=0.8)
    ths = np.quantile(field, [0.7, 0.45, 0.25]).astype(np.float32)
    got = np.asarray(multi_threshold_ccl_banded(
        jnp.asarray(field), jnp.asarray(ths), block=16, interpret=True))
    ref, opened = _xla_labels(field, ths)
    np.testing.assert_array_equal(got, ref)
    res = np.asarray(multi_threshold_ccl(jnp.asarray(opened), block=16,
                                         interpret=True))
    np.testing.assert_array_equal(got, res)


def test_banded_serpentine_jumps():
    """The adversarial serpentine converges (jump rounds fire on the HBM
    plane) and stays exact; stats report the pass counts."""
    h, w = 96, 256
    field = np.zeros((h, w), np.float32)
    field[::2, :] = 1.0
    for i in range(0, h - 2, 2):
        field[i + 1, 0 if (i // 2) % 2 == 0 else w - 1] = 1.0
    ths = np.asarray([0.5, 0.25], np.float32)
    field = field + 0.3  # second level = everything
    got, stats = multi_threshold_ccl_banded(
        jnp.asarray(field), jnp.asarray(ths), block=16,
        return_stats=True, interpret=True)
    ref, _ = _xla_labels(field, ths)
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert np.asarray(stats).shape == (2,)


def test_resident_fused_matches_everything():
    """The VMEM-resident kernel's in-kernel-mask variant
    (multi_threshold_ccl_fused) == XLA == banded on noise and
    percolation — the production TPU path inside the VMEM gate."""
    from plumekit.ops.pallas.ccl_sweep import multi_threshold_ccl_fused

    for seed, smooth, qs in ((3, 1.0, [0.9, 0.5, 0.2]),
                             (7, 0.8, [0.7, 0.45, 0.25])):
        field = _field(seed, (96, 130), smooth)
        ths = np.quantile(field, qs).astype(np.float32)
        got = np.asarray(multi_threshold_ccl_fused(
            jnp.asarray(field), jnp.asarray(ths), block=16,
            interpret=True))
        ref, _ = _xla_labels(field, ths)
        np.testing.assert_array_equal(got, ref)
    # stats variant wiring
    got2, stats = multi_threshold_ccl_fused(
        jnp.asarray(field), jnp.asarray(ths), block=16,
        return_stats=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got2), ref)
    assert np.asarray(stats).shape == (3,)


def test_banded_degenerate_levels():
    """Empty and full levels, exact lane-multiple width (wrap hazards),
    and a height that does not divide the block."""
    h, w = 44, 128
    field = np.zeros((h, w), np.float32)
    field[10:20, 30:60] = 1.0
    ths = np.asarray([2.0, 0.5, -1.0], np.float32)  # empty / blob / full
    got = np.asarray(multi_threshold_ccl_banded(
        jnp.asarray(field), jnp.asarray(ths), block=16, interpret=True))
    ref, _ = _xla_labels(field, ths)
    np.testing.assert_array_equal(got, ref)
