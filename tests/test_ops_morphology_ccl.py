"""Golden-array tests: device morphology & CCL vs scipy oracles on random and
structured masks (SURVEY.md §4 test strategy point 1)."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from plumekit.ops import (
    binary_erosion,
    binary_dilation,
    binary_dilation_square,
    binary_opening_cross,
    connected_components,
    connected_components_host,
    component_sizes,
    remove_small_components,
)

CROSS = ndimage.generate_binary_structure(2, 1)


def random_masks(rng, n=6, shape=(64, 64), p=0.35):
    return [rng.random(shape) < p for _ in range(n)]


def test_erosion_matches_scipy_interior(rng):
    # skimage pads erosion with True; scipy pads with border_value — compare
    # on the interior where padding can't matter, and with border_value=1 at
    # the edge for exactness
    for m in random_masks(rng):
        ours = np.asarray(binary_erosion(jnp.asarray(m)))
        scipy_out = ndimage.binary_erosion(m, structure=CROSS, border_value=1)
        np.testing.assert_array_equal(ours, scipy_out)


def test_dilation_matches_scipy(rng):
    for m in random_masks(rng):
        ours = np.asarray(binary_dilation(jnp.asarray(m)))
        scipy_out = ndimage.binary_dilation(m, structure=CROSS, border_value=0)
        np.testing.assert_array_equal(ours, scipy_out)


def test_opening_cross_composition(rng):
    m = random_masks(rng, n=1)[0]
    ours = np.asarray(binary_opening_cross(jnp.asarray(m)))
    ref = ndimage.binary_dilation(
        ndimage.binary_erosion(m, structure=CROSS, border_value=1),
        structure=CROSS, border_value=0,
    )
    np.testing.assert_array_equal(ours, ref)


def test_dilation_square(rng):
    m = random_masks(rng, n=2, p=0.1)[0]
    ours = np.asarray(binary_dilation_square(jnp.asarray(m), 5))
    ref = ndimage.binary_dilation(m, structure=np.ones((5, 5)), border_value=0)
    np.testing.assert_array_equal(ours, ref)


def test_morphology_batched(rng):
    ms = np.stack(random_masks(rng, n=4))
    ours = np.asarray(binary_erosion(jnp.asarray(ms)))
    for i in range(4):
        np.testing.assert_array_equal(
            ours[i], ndimage.binary_erosion(ms[i], structure=CROSS, border_value=1)
        )


def _partitions_equal(a, b):
    """Same connected-component partition, label values irrelevant."""
    assert (a > 0).sum() == (b > 0).sum()
    fg = a > 0
    assert np.array_equal(fg, b > 0)
    # build bijection
    pairs = set(zip(a[fg].ravel(), b[fg].ravel()))
    assert len({x for x, _ in pairs}) == len(pairs)
    assert len({y for _, y in pairs}) == len(pairs)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_ccl_matches_scipy_random(rng, connectivity):
    for p in (0.2, 0.5, 0.7):
        m = rng.random((48, 48)) < p
        ours = np.asarray(connected_components(jnp.asarray(m), connectivity))
        structure = np.ones((3, 3)) if connectivity == 2 else None
        ref, _ = ndimage.label(m, structure=structure)
        _partitions_equal(ours, ref)


def test_ccl_snake():
    # a winding snake exercises multi-sweep convergence
    m = np.zeros((32, 32), dtype=bool)
    m[0, :] = True
    m[:, -1] = True
    m[-1, ::2] = True  # comb teeth touching the bottom row? no - disconnected
    m[-1, :] = True
    m[::2, 0] = False
    m[16, 1:-1] = True
    ours = np.asarray(connected_components(jnp.asarray(m), 2))
    ref, _ = ndimage.label(m, structure=np.ones((3, 3)))
    _partitions_equal(ours, ref)


def test_ccl_spiral():
    # archimedean spiral: worst case for scan propagation
    m = np.zeros((64, 64), dtype=bool)
    r, c = 32, 32
    m[r, c] = True
    step = 1
    dr, dc = 0, 1
    pos = np.array([r, c])
    for leg in range(20):
        for _ in range(step):
            pos = pos + [dr, dc]
            if 0 <= pos[0] < 64 and 0 <= pos[1] < 64:
                m[pos[0], pos[1]] = True
        dr, dc = dc, -dr
        if leg % 2 == 1:
            step += 2
    ours = np.asarray(connected_components(jnp.asarray(m), 2))
    ref, _ = ndimage.label(m, structure=np.ones((3, 3)))
    _partitions_equal(ours, ref)


def test_component_sizes_and_remove_small(rng):
    m = rng.random((40, 40)) < 0.3
    lbl = connected_components(jnp.asarray(m), 2)
    sizes = np.asarray(component_sizes(lbl))
    ref, n = ndimage.label(m, structure=np.ones((3, 3)))
    ref_sizes = sorted(np.bincount(ref.ravel())[1:].tolist())
    got = sorted(
        int(sizes[l]) for l in np.unique(np.asarray(lbl)) if l != 0
    )
    assert got == ref_sizes

    kept = np.asarray(remove_small_components(lbl, 5))
    ref_keep = ref.copy()
    for l in range(1, n + 1):
        if (ref == l).sum() < 5:
            ref_keep[ref == l] = 0
    np.testing.assert_array_equal(kept > 0, ref_keep > 0)


def test_ccl_host_oracle_agrees(rng):
    m = rng.random((32, 32)) < 0.4
    host = connected_components_host(m, 2)
    dev = np.asarray(connected_components(jnp.asarray(m), 2))
    _partitions_equal(dev, host)


@pytest.mark.parametrize("case", ["ring", "checker", "row", "col", "cross"])
def test_ccl_pathological_shapes(case):
    m = np.zeros((40, 40), dtype=bool)
    if case == "ring":
        m[5:35, 5:35] = True
        m[10:30, 10:30] = False
    elif case == "checker":
        m[::2, ::2] = True
        m[1::2, 1::2] = True  # 8-connectivity joins everything
    elif case == "row":
        m[20, 1:39] = True
    elif case == "col":
        m[1:39, 20] = True
    elif case == "cross":
        m[20, :] = True
        m[:, 20] = True
    ours = np.asarray(connected_components(jnp.asarray(m), 2))
    ref, _ = ndimage.label(m, structure=np.ones((3, 3)))
    _partitions_equal(ours, ref)


def test_ccl_warm_start_matches_cold(rng):
    """Warm-starting from a tighter (subset) mask's labels must reach the
    identical fixed point as a cold labeling — the invariant behind the
    sweep pipeline's tightest→loosest scan."""
    import jax.numpy as jnp

    from plumekit.ops.ccl import connected_components

    field = rng.random((96, 96)).astype(np.float32)
    field = np.maximum(field, np.roll(field, 1, 0))  # correlated-ish
    tight = jnp.asarray(field > 0.7)
    loose = jnp.asarray(field > 0.35)   # superset of tight by construction

    lbl_tight = connected_components(tight, connectivity=2)
    cold = connected_components(loose, connectivity=2)
    warm = connected_components(loose, connectivity=2,
                                init_labels=lbl_tight)
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(warm))

    # warm start from an empty labeling is exactly the cold path
    warm0 = connected_components(
        loose, connectivity=2, init_labels=jnp.zeros((96, 96), jnp.int32))
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(warm0))
