"""On-chip assertions, skipped unless the session runs on a real TPU.

The main suite forces the CPU backend (conftest), so the Mosaic-compiled
paths are exercised here behind ``PLUMEKIT_RUN_TPU=1`` — run occasionally
on the tunneled chip:

    PLUMEKIT_RUN_TPU=1 python -m pytest tests/test_tpu_only.py -q -p no:cacheprovider --noconftest

(``--noconftest`` so the CPU-forcing fixture does not apply.)
"""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PLUMEKIT_RUN_TPU") != "1",
    reason="on-chip tests; set PLUMEKIT_RUN_TPU=1 and run with --noconftest",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jax.default_backend() in ("cpu", "gpu"):
        pytest.skip("no TPU backend in this session")
    return jax


def test_ccl_kernel_parity_on_chip(tpu):
    """Mosaic-compiled multi-threshold CCL == XLA labels at a realistic
    percolation mix (the compile is cached from the benchmarks)."""
    import jax.numpy as jnp
    from scipy import ndimage

    from plumekit.ops.ccl import connected_components
    from plumekit.ops.pallas.ccl_sweep import multi_threshold_ccl

    rng = np.random.default_rng(0)
    field = ndimage.gaussian_filter(
        rng.random((640, 600)).astype(np.float32), 1.0)
    ths = np.quantile(field, [0.9, 0.55, 0.5, 0.45, 0.2])
    opened = np.stack([field > t for t in ths])
    got = np.asarray(multi_threshold_ccl(jnp.asarray(opened)))
    for i in range(len(ths)):
        ref = np.asarray(connected_components(jnp.asarray(opened[i]),
                                              connectivity=2))
        np.testing.assert_array_equal(got[i], ref)


def test_ccl_fused_and_banded_parity_on_chip(tpu):
    """Round-5 production CCL paths on real silicon: the VMEM-resident
    fused-mask kernel and the HBM-banded kernel both == the XLA
    mask→opening→label chain (thresholding and cross opening included),
    on a percolation mix whose loose level exercises the worklist AND
    the sparse pointer-jump DMAs."""
    import jax.numpy as jnp
    from scipy import ndimage

    from plumekit.ops.ccl import connected_components
    from plumekit.ops.morphology import binary_opening_cross
    from plumekit.ops.pallas.ccl_banded import multi_threshold_ccl_banded
    from plumekit.ops.pallas.ccl_sweep import multi_threshold_ccl_fused

    rng = np.random.default_rng(2)
    field = ndimage.gaussian_filter(
        rng.random((640, 600)).astype(np.float32), 0.8)
    ths = np.quantile(field, [0.9, 0.55, 0.45, 0.3]).astype(np.float32)
    opened = binary_opening_cross(
        jnp.asarray(field)[None] > jnp.asarray(ths)[:, None, None])
    ref = np.stack([
        np.asarray(connected_components(opened[i], connectivity=2))
        for i in range(len(ths))])
    fused = np.asarray(multi_threshold_ccl_fused(
        jnp.asarray(field), jnp.asarray(ths)))
    np.testing.assert_array_equal(fused, ref)
    banded = np.asarray(multi_threshold_ccl_banded(
        jnp.asarray(field), jnp.asarray(ths)))
    np.testing.assert_array_equal(banded, ref)


def test_fused_conv_parity_on_chip(tpu):
    """Mosaic-compiled fused double conv == XLA taps (bf16 tolerance)."""
    import jax
    import jax.numpy as jnp

    from plumekit.models.pallas.fused_conv import (
        conv3x3_bn_relu_xla, fused_double_conv3x3_bn_relu)

    rng = np.random.default_rng(1)
    c = 128
    x = jnp.asarray(rng.standard_normal((1, 32, 36, c)), jnp.bfloat16)
    w1 = jnp.asarray(0.1 * rng.standard_normal((3, 3, c, c)), jnp.bfloat16)
    w2 = jnp.asarray(0.1 * rng.standard_normal((3, 3, c, c)), jnp.bfloat16)
    s1 = jnp.ones((c,), jnp.bfloat16)
    b1 = jnp.zeros((c,), jnp.bfloat16)
    got = fused_double_conv3x3_bn_relu(x, w1, s1, b1, w2, s1, b1)
    ref = conv3x3_bn_relu_xla(conv3x3_bn_relu_xla(x, w1, s1, b1), w2, s1, b1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.25, rtol=0.1)  # bf16 accumulation-order tolerance
    corr = np.corrcoef(np.asarray(got, np.float32).ravel(),
                       np.asarray(ref, np.float32).ravel())[0, 1]
    assert corr > 0.9999


def test_unet_megakernel_parity_on_chip(tpu):
    """Mosaic-compiled whole-U-Net megakernel == flax apply on-chip.

    Guards the round-2 fix for the concat-store corruption (planes staged
    piece-by-piece — unet_mega._store_pieces): before it, scattered sublane
    tiles diverged by ~20%; after, every dbg stage is bit-exact vs
    interpret and the full net tracks flax at bf16 tolerance."""
    import jax
    import jax.numpy as jnp

    from plumekit.config.train import UNetConfig
    from plumekit.models.pallas.unet_mega import make_mega_apply
    from plumekit.models.unet import UNet

    cfg = UNetConfig(in_channels=2, base_features=8, depth=4,
                     norm="batch", compute_dtype="bfloat16")
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 64, 2), jnp.float32)
    variables = model.init(rng, x, train=False)
    bs = jax.tree.map(lambda a: a + 0.3 * jax.random.normal(
        jax.random.fold_in(rng, a.size), a.shape, a.dtype) ** 2,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    ref = np.asarray(model.apply(variables, x, train=False), np.float32)
    got = np.asarray(jax.jit(make_mega_apply(cfg))(variables, x),
                     np.float32)
    rel = np.abs(ref - got).max() / np.abs(ref).max()
    assert rel < 0.05, f"relative error {rel:.4f}"


def test_int8_forward_parity_on_chip(tpu):
    """On-chip int8 forward tracks the fp32 flax forward, and the
    custom_vmap batch-fold (the round-3 fix for the 2.9x vmap
    pessimization — docs/performance.md) is value-preserving on real
    silicon: vmap over a granule axis == the flat fold to one requant LSB.
    Guards the serving path the int8 bench default executes."""
    import jax
    import jax.numpy as jnp

    from plumekit.config.train import TrainConfig, UNetConfig
    from plumekit.models import UNet
    from plumekit.models.quantized_forward import (make_quantized_apply,
                                                   quantize_unet)
    from plumekit.train.state import create_state

    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="float32")
    state = create_state(jax.random.PRNGKey(0), cfg,
                         TrainConfig(tile_size=64))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.random((2, 64, 64, 2), np.float32))
    qvars = quantize_unet(variables, cfg, calib)
    apply = make_quantized_apply(cfg)

    x = jnp.asarray(rng.random((2, 64, 64, 2), np.float32))
    ref = np.asarray(UNet(cfg).apply(variables, x, train=False),
                     np.float32).ravel()
    got = np.asarray(jax.jit(lambda q, t: apply(q, t))(qvars, x),
                     np.float32).ravel()
    assert np.corrcoef(got, ref)[0, 1] > 0.99
    span = ref.max() - ref.min()
    assert np.abs(got - ref).max() < 0.15 * span, (
        np.abs(got - ref).max(), span)

    xg = jnp.asarray(rng.random((3, 2, 64, 64, 2), np.float32))
    vm = np.asarray(jax.jit(jax.vmap(lambda t: apply(qvars, t)))(xg))
    japply = jax.jit(lambda q, t: apply(q, t))
    loop = np.stack([np.asarray(japply(qvars, xg[g])) for g in range(3)])
    np.testing.assert_allclose(vm, loop, rtol=0, atol=2e-3)


def test_label_counts_kernel_parity_on_chip(tpu):
    """The fire-label-counts kernel (round 4): compiled counts bit-equal
    to the XLA compare+reduce on random label planes."""
    import jax.numpy as jnp

    from plumekit.ops.pallas.label_counts import fire_label_counts

    rng = np.random.default_rng(11)
    labels = rng.integers(0, 80, (6, 300, 411)).astype(np.int32)
    labs = rng.integers(0, 90, (6, 32)).astype(np.int32)
    got = np.asarray(fire_label_counts(jnp.asarray(labels),
                                       jnp.asarray(labs)))
    want = (labels[:, None] == labs[:, :, None, None]).sum(
        (2, 3)).astype(np.int32)
    np.testing.assert_array_equal(got, want)
