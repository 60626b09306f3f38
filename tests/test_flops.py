"""Analytic FLOP counter (models/flops.py) — hand-computed oracle cases.

The bench MFU fields (VERDICT round-4 #5) are only as honest as this
counter, so the base case is verified against a full by-hand expansion.
"""

import math

import pytest

from plumekit.config.train import UNetConfig
from plumekit.models.flops import (mfu, model_flops_per_pixel,
                                   sliding_redundancy)


def test_unet_hand_case():
    # depth-1 U-Net, 1→2 features, 1 in / 1 out channel. By hand:
    # enc:  conv(1→2)=36 + conv(2→2)=72             = 108   (area 1)
    # botl: (conv(2→4)=144 + conv(4→4)=288) / 4     = 108   (area 1/4)
    # dec:  up(4→2)=16 + conv(4→2)=144 + conv(2→2)=72 = 232 (area 1)
    # head: 1×1 conv(2→1)                           = 4
    cfg = UNetConfig(in_channels=1, out_channels=1, base_features=2,
                     depth=1)
    assert model_flops_per_pixel(cfg) == pytest.approx(452.0)


def test_unetpp_depth1_equals_unet():
    # at depth 1 the UNet++ grid degenerates to exactly the U-Net wiring
    u = UNetConfig(in_channels=1, out_channels=1, base_features=2, depth=1)
    pp = UNetConfig(in_channels=1, out_channels=1, base_features=2,
                    depth=1, arch="unetpp")
    assert model_flops_per_pixel(pp) == pytest.approx(
        model_flops_per_pixel(u))


def test_unetpp_denser_than_unet_and_pruning_monotone():
    u = UNetConfig()
    pp = UNetConfig(arch="unetpp", deep_supervision=True)
    full = model_flops_per_pixel(pp)
    assert full > model_flops_per_pixel(u)
    prev = 0.0
    for lvl in range(1, pp.depth + 1):
        cur = model_flops_per_pixel(
            UNetConfig(arch="unetpp", deep_supervision=True,
                       prune_level=lvl))
        assert cur > prev
        prev = cur
    assert prev == pytest.approx(full)  # L = depth is the full grid


def test_sliding_redundancy():
    # fast tiling 256/0 on 8192²: exact 32×32 cover, no redundancy
    assert sliding_redundancy(8192, 256, 0) == pytest.approx(1.0)
    # headline 288/32: stride 256 → 32 tiles/axis of 288² on 8192²
    r = sliding_redundancy(8192, 288, 32)
    assert r == pytest.approx(32 * 32 * 288 * 288 / 8192**2)
    # sub-tile image: one clamped tile
    assert sliding_redundancy(100, 256, 0) == pytest.approx(
        256 * 256 / 100**2)


def test_mfu_numbers():
    out = mfu(100.0, 1e6, peak="bf16", redundancy=1.27)
    assert out["tflops"] == pytest.approx(127.0, abs=0.05)
    assert out["pct_peak"] == pytest.approx(100 * 127 / 197, abs=0.05)
    assert math.isfinite(out["pct_peak"])
