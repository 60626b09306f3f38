"""Blob-detector exactness vs the scipy oracle (VERDICT round-3 weak #5).

``tests/oracle_blob.py`` restates the published skimage algorithm in plain
scipy; the device detectors are diffed against it one-to-one on shared
fixtures. Known divergence sources (documented in docs/parity.md):
discrete 5-point Laplacian / finite-difference Hessian of the blurred
image vs scipy's analytic kernel derivatives, and edge-replicate vs
reflect boundaries — so the contract is set equality with per-blob
tolerances (centre ≤ 2 px, sigma within one ladder step), not bit
equality."""

from __future__ import annotations

import numpy as np
import pytest

from plumekit.config.identify import BlobIdentifyConfig
from plumekit.identify.blob import blob_dog, blob_doh, blob_log

from tests.oracle_blob import (
    oracle_blob_dog,
    oracle_blob_doh,
    oracle_blob_log,
)

PLANTED = [
    (32.0, 40.0, 3.0),
    (36.0, 150.0, 6.0),
    (110.0, 60.0, 9.0),
    (150.0, 160.0, 14.0),
]


def _scene(noise: float = 0.0, seed: int = 0):
    h = w = 200
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for r0, c0, s in PLANTED:
        img += np.exp(-0.5 * (((yy - r0) / s) ** 2 + ((xx - c0) / s) ** 2))
    if noise:
        img += noise * np.random.default_rng(seed).standard_normal((h, w))
    return img.astype(np.float32)


def _diff(device_blobs, oracle_blobs, pos_tol, sigma_tol):
    """Greedy one-to-one matching; returns (n_matched, unmatched_device,
    unmatched_oracle, max_pos_delta, max_sigma_delta)."""
    used = np.zeros(len(oracle_blobs), bool)
    pos_ds, sig_ds = [], []
    un_dev = []
    for r, c, rad in device_blobs:
        best, best_d = -1, np.inf
        for j, (r2, c2, rad2) in enumerate(oracle_blobs):
            if used[j]:
                continue
            d = np.hypot(r - r2, c - c2)
            if d < best_d and d <= pos_tol and abs(rad - rad2) <= sigma_tol:
                best, best_d = j, d
        if best >= 0:
            used[best] = True
            pos_ds.append(best_d)
            sig_ds.append(abs(rad - oracle_blobs[best][2]))
        else:
            un_dev.append((r, c, rad))
    un_ora = [tuple(b) for b, u in zip(oracle_blobs, used) if not u]
    return (int(used.sum()), un_dev, un_ora,
            max(pos_ds, default=0.0), max(sig_ds, default=0.0))


CFG = BlobIdentifyConfig(min_sigma=2.0, max_sigma=16.0, num_sigma=15,
                         threshold_log=0.05, threshold_dog=0.05,
                         threshold_doh=0.005)
LADDER_STEP = (CFG.max_sigma - CFG.min_sigma) / (CFG.num_sigma - 1)


CASES = [
    ("log", lambda img: blob_log(img, CFG),
     lambda img: oracle_blob_log(img, CFG.min_sigma, CFG.max_sigma,
                                 CFG.num_sigma, CFG.threshold_log,
                                 CFG.overlap),
     np.sqrt(2.0) * LADDER_STEP + 1e-3),
    ("dog", lambda img: blob_dog(img, CFG),
     lambda img: oracle_blob_dog(img, CFG.min_sigma, CFG.max_sigma, 1.6,
                                 CFG.threshold_dog, CFG.overlap),
     np.sqrt(2.0) * (CFG.min_sigma * 1.6**3 - CFG.min_sigma * 1.6**2)),
    ("doh", lambda img: blob_doh(img, CFG),
     lambda img: oracle_blob_doh(img, CFG.min_sigma, CFG.max_sigma,
                                 CFG.num_sigma, CFG.threshold_doh,
                                 CFG.overlap),
     LADDER_STEP + 1e-3),
]


@pytest.mark.parametrize("name,dev,ora,sigma_tol", CASES,
                         ids=[c[0] for c in CASES])
@pytest.mark.parametrize("noise", [0.0, 0.03], ids=["clean", "noisy"])
def test_device_matches_oracle(name, dev, ora, sigma_tol, noise):
    img = _scene(noise=noise)
    d = np.asarray(dev(img))
    o = np.asarray(ora(img))
    assert len(o) >= len(PLANTED) - 1, f"oracle found too few: {o}"
    n, un_dev, un_ora, dpos, dsig = _diff(d, o, pos_tol=2.0,
                                          sigma_tol=sigma_tol)
    # the quantified-divergence contract: every oracle blob has a device
    # match within (2 px, one ladder step) and vice versa, up to ONE
    # borderline blob per side (threshold-grazing responses can fall on
    # opposite sides of the cutoff under the differing discretisations)
    assert len(un_ora) <= 1, (
        f"{name}: device missed oracle blobs {un_ora}; device={d}")
    assert len(un_dev) <= 1, (
        f"{name}: device invented blobs {un_dev}; oracle={o}")
    assert n >= max(len(o), len(d)) - 1
    print(f"[{name} noise={noise}] matched {n} "
          f"(device {len(d)}, oracle {len(o)}), max |Δpos| {dpos:.2f} px, "
          f"max |Δradius| {dsig:.2f}")


def test_pruning_matches_oracle_convention():
    """Two heavily-overlapping blobs: both implementations keep exactly
    the larger-sigma one."""
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (np.exp(-0.5 * (((yy - 48) / 8) ** 2 + ((xx - 48) / 8) ** 2))
           + 0.7 * np.exp(-0.5 * (((yy - 52) / 3) ** 2
                                  + ((xx - 52) / 3) ** 2))
           ).astype(np.float32)
    d = blob_log(img, CFG)
    o = oracle_blob_log(img, CFG.min_sigma, CFG.max_sigma, CFG.num_sigma,
                        CFG.threshold_log, CFG.overlap)
    assert len(d) == len(o) == 1
    assert abs(d[0][2] - o[0][2]) <= np.sqrt(2.0) * LADDER_STEP + 1e-3
