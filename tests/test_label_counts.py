"""Pallas fire-label-counts kernel (ops/pallas/label_counts.py):
bit-equality with the XLA compare+reduce formulation (interpret mode —
the on-chip path is covered by the TPU-only parity gate)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plumekit.ops.pallas.label_counts import fire_label_counts


def _xla_counts(labels, labs):
    return (labels[:, None] == labs[:, :, None, None]).sum(
        (2, 3)).astype(np.int32)


@pytest.mark.parametrize("shape,f", [((3, 64, 64), 4), ((5, 100, 190), 13),
                                     ((2, 257, 129), 128), ((1, 8, 128), 1)])
def test_counts_match_xla(shape, f):
    rng = np.random.default_rng(sum(shape) + f)
    labels = rng.integers(0, 40, shape).astype(np.int32)
    labs = rng.integers(0, 50, (shape[0], f)).astype(np.int32)
    got = np.asarray(fire_label_counts(jnp.asarray(labels),
                                       jnp.asarray(labs), interpret=True))
    np.testing.assert_array_equal(got, _xla_counts(labels, labs))


def test_counts_absent_zero_and_dominant_labels():
    """labs entries that never occur count 0; the background label (0)
    counts the full background — the callers' found-masking contract."""
    labels = np.zeros((1, 32, 200), np.int32)
    labels[0, :4, :10] = 7
    labs = np.array([[7, 0, 99]], np.int32)
    got = np.asarray(fire_label_counts(jnp.asarray(labels),
                                       jnp.asarray(labs), interpret=True))
    np.testing.assert_array_equal(got, [[40, 32 * 200 - 40, 0]])


def test_counts_validation():
    labels = jnp.zeros((1, 16, 16), jnp.int32)
    with pytest.raises(ValueError, match="capacity"):
        fire_label_counts(labels, jnp.zeros((1, 129), jnp.int32),
                          interpret=True)
    with pytest.raises(ValueError, match="multiple"):
        fire_label_counts(labels, jnp.zeros((1, 4), jnp.int32), block=12,
                          interpret=True)


def test_pick_block_vmem_budget():
    """Wide scenes shrink the row block so the double-buffered streamed
    block stays inside the VMEM budget (round-4 advisor finding: at
    w ≥ 16384 the default 256-row block alone hit the 16 MB scoped cap);
    absurd widths return None and the pipeline keeps the XLA branch."""
    from plumekit.ops.pallas.label_counts import _VMEM_BUDGET, pick_block

    assert pick_block(1200) == 256           # the 1200² protocol: unchanged
    for w in (4096, 8192, 16384, 40000):
        blk = pick_block(w)
        assert blk is not None and blk % 8 == 0
        w_pad = -(-w // 128) * 128
        assert 2 * blk * w_pad * 4 <= _VMEM_BUDGET
    assert pick_block(300_000) is None
    # auto-block path stays bit-equal on a wide scene (block shrinks)
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 30, (2, 24, 16500)).astype(np.int32)
    labs = rng.integers(0, 40, (2, 5)).astype(np.int32)
    got = np.asarray(fire_label_counts(jnp.asarray(labels),
                                       jnp.asarray(labs), interpret=True))
    np.testing.assert_array_equal(got, _xla_counts(labels, labs))


def test_pipeline_xla_branch_unchanged():
    """The CPU pipeline keeps the XLA branch (backend gate): identify
    still runs and the sizes feeding extents agree with a hand count."""
    from plumekit.identify.pipeline import (SweepStatics,
                                            make_sweep_identifier)

    s = SweepStatics(win_half=4, min_plume_pixels=2, max_plume_pixels=500,
                     max_lim=0.0, axis_ratio=0.0, max_peaks=99,
                     n_transect=16, use_mask_b=False,
                     reject_last_threshold=False)
    fn = make_sweep_identifier(s)
    rng = np.random.default_rng(0)
    aod = rng.random((48, 48)).astype(np.float32)
    aod[20:28, 20:28] += 2.0
    th = jnp.asarray([2.0, 1.5], jnp.float32)
    out = fn(jnp.asarray(aod), jnp.asarray(aod),
             jnp.zeros((48, 48), bool), th,
             jnp.asarray([24]), jnp.asarray([24]), jnp.asarray([True]))
    assert int(out["extents"][0, 0]) > 0
