"""Native C++ CCL/region-stats vs scipy oracle."""

import numpy as np
import pytest
from scipy import ndimage

from plumekit import native


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return True


def _partitions_equal(a, b):
    fg = a > 0
    assert np.array_equal(fg, b > 0)
    pairs = set(zip(a[fg].ravel(), b[fg].ravel()))
    assert len({x for x, _ in pairs}) == len(pairs)
    assert len({y for _, y in pairs}) == len(pairs)


@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("p", [0.2, 0.5, 0.8])
def test_native_ccl_matches_scipy(have_native, connectivity, p, rng):
    m = rng.random((73, 91)) < p
    labels, n = native.ccl_label(m, connectivity)
    structure = np.ones((3, 3)) if connectivity == 2 else None
    ref, ref_n = ndimage.label(m, structure=structure)
    assert n == ref_n
    _partitions_equal(labels, ref)


def test_native_ccl_empty_and_full(have_native):
    labels, n = native.ccl_label(np.zeros((8, 8), bool))
    assert n == 0 and labels.max() == 0
    labels, n = native.ccl_label(np.ones((8, 8), bool))
    assert n == 1 and (labels == 1).all()


def test_native_region_stats(have_native, rng):
    m = rng.random((64, 64)) < 0.3
    labels, n = native.ccl_label(m, 2)
    areas, bboxes, centroids = native.region_stats(labels, n)
    for i in range(1, n + 1):
        ys, xs = np.nonzero(labels == i)
        assert areas[i - 1] == ys.size
        assert tuple(bboxes[i - 1]) == (ys.min(), xs.min(), ys.max() + 1,
                                        xs.max() + 1)
        np.testing.assert_allclose(centroids[i - 1], (ys.mean(), xs.mean()))


def test_native_component_sizes(have_native, rng):
    m = rng.random((32, 32)) < 0.4
    labels, n = native.ccl_label(m, 2)
    sizes = native.component_sizes(labels, n)
    assert sizes[0] == (labels == 0).sum()
    for i in range(1, n + 1):
        assert sizes[i] == (labels == i).sum()


def _np_quantize_uint16(channels):
    # the numpy fallback path of ops/quant.quantize_uint16, restated so the
    # test pins the native codec against it even when native is available
    c = channels.shape[-1]
    flat = channels.reshape(-1, c)
    lo = flat.min(axis=0).astype(np.float32)
    hi = flat.max(axis=0).astype(np.float32)
    scale = np.maximum(hi - lo, 1e-12).astype(np.float32) / 65535.0
    q = np.round((flat - lo) / scale).astype(np.uint16).reshape(
        channels.shape)
    return q, lo, scale


@pytest.mark.parametrize("shape", [(57, 63, 2), (97, 131, 3), (5, 1),
                                   (33, 64)])
def test_native_quantize_bit_exact(have_native, shape, rng):
    x = (rng.random(shape) * 2.7 - 1.3).astype(np.float32)
    q, lo, scale = native.quantize_uint16(x)
    qr, lor, sr = _np_quantize_uint16(x)
    assert np.array_equal(q, qr)          # incl. round-half-to-even ties
    assert np.array_equal(lo, lor) and np.array_equal(scale, sr)
    assert q.dtype == np.uint16 and lo.dtype == np.float32


def test_native_quantize_constant_channel(have_native):
    x = np.zeros((16, 16, 2), np.float32)
    x[..., 1] = 3.5
    q, lo, scale = native.quantize_uint16(x)
    qr, lor, sr = _np_quantize_uint16(x)
    assert np.array_equal(q, qr)
    assert np.array_equal(lo, lor) and np.array_equal(scale, sr)


def test_native_quantize_nonfinite_raises(have_native):
    bad = np.ones((4, 4, 2), np.float32)
    bad[1, 1, 0] = np.nan
    with pytest.raises(ValueError, match="finite"):
        native.quantize_uint16(bad)
    bad[1, 1, 0] = np.inf
    with pytest.raises(ValueError, match="finite"):
        native.quantize_uint16(bad)


def test_ops_quant_dispatches_native(have_native, rng):
    # the public codec must give the same answer whichever path it takes
    from plumekit.ops.quant import quantize_uint16

    x = (rng.random((40, 52, 2)) * 1.8).astype(np.float32)
    q, lo, scale = quantize_uint16(x)
    qr, lor, sr = _np_quantize_uint16(x)
    assert np.array_equal(q, qr)
    assert np.array_equal(lo, lor) and np.array_equal(scale, sr)


def test_native_quantize_mask_uint8(have_native, rng):
    m = rng.random((64, 64)).astype(np.float32)
    m[0, 0], m[0, 1] = -0.5, 1.5  # clip range
    out = native.quantize_mask_uint8(m)
    ref = np.rint(np.clip(m, 0.0, 1.0) * 255.0).astype(np.uint8)
    assert np.array_equal(out, ref)
    # hard {0,1} labels encode exactly
    hard = (rng.random((32, 32)) < 0.5).astype(np.float32)
    assert np.array_equal(native.quantize_mask_uint8(hard),
                          (hard * 255).astype(np.uint8))


def test_native_speed_smoke(have_native, rng):
    # the point of the native path: a 1200^2 label in well under a second
    import time

    m = rng.random((1200, 1200)) < 0.45
    t0 = time.perf_counter()
    labels, n = native.ccl_label(m, 2)
    dt = time.perf_counter() - t0
    assert n > 0
    assert dt < 2.0, f"native CCL too slow: {dt:.2f}s"
