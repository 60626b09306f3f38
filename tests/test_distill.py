"""Offline knowledge distillation (train/distill.py): teacher soft labels.

The reference has no training at all (its train_model was promised in
README.md:41-45, never committed); distillation is part of plumekit's L4
extension — train the UNet++ quality pick once, serve its knowledge
through the fast int8 U-Net body.
"""

import numpy as np
import pytest

from plumekit.config.train import (DataConfig, InferConfig, TrainConfig,
                                   UNetConfig)
from plumekit.train.data import make_synthetic_dataset

SMALL_UNET = UNetConfig(in_channels=2, base_features=8, depth=2,
                        compute_dtype="float32")
DATA = DataConfig(granule_size=96, tile_size=32, n_train_granules=2,
                  n_eval_granules=1)
INFER = InferConfig(tile_size=32, overlap=8, batch_tiles=4)


def _train_teacher(tmp_path, arch="unet", deep_supervision=False):
    from plumekit.train.loop import train

    ckpt = str(tmp_path / "teacher")
    cfg = TrainConfig(batch_size=2, tile_size=32, total_steps=4,
                      warmup_steps=2, checkpoint_every=4, log_every=4,
                      checkpoint_dir=ckpt, augment=False)
    unet = SMALL_UNET if arch == "unet" else UNetConfig(
        in_channels=2, base_features=8, depth=2, compute_dtype="float32",
        arch="unetpp", deep_supervision=deep_supervision)
    train(unet, cfg, DATA)
    return ckpt


def test_distill_blend_semantics(tmp_path):
    from plumekit.train.distill import distill_samples

    ckpt = _train_teacher(tmp_path)
    samples = make_synthetic_dataset(DATA, train=True)
    hard = [s.mask.copy() for s in samples]

    # alpha=0 is a no-op on the labels
    out0 = distill_samples(samples, ckpt, alpha=0.0, infer_cfg=INFER)
    for s, h in zip(out0, hard):
        np.testing.assert_allclose(s.mask, h, atol=1e-6)

    # alpha=1 trains purely on the teacher: strictly soft probabilities
    out1 = distill_samples(samples, ckpt, alpha=1.0, infer_cfg=INFER)
    for s, h in zip(out1, hard):
        assert s.mask.shape == h.shape
        assert np.all(s.mask >= 0.0) and np.all(s.mask <= 1.0)
        assert np.any((s.mask > 0.0) & (s.mask < 1.0))

    # intermediate alpha is the exact linear blend of the two endpoints
    out_mid = distill_samples(samples, ckpt, alpha=0.25, infer_cfg=INFER)
    for sm, s1, h in zip(out_mid, out1, hard):
        np.testing.assert_allclose(sm.mask, 0.25 * s1.mask + 0.75 * h,
                                   atol=1e-5)
    # channels pass through untouched
    for sm, s in zip(out_mid, samples):
        np.testing.assert_array_equal(sm.channels, s.channels)


def test_soft_masks_keep_plume_biased_sampling():
    """The tile sampler's plume index must threshold at 0.5, not nonzero:
    teacher soft labels are nonzero almost everywhere, which would turn
    the 50% plume-centred draws uniform (and build an H·W index table)."""
    from plumekit.train.data import GranuleSample, _prep_samples

    rng = np.random.default_rng(0)
    soft = rng.uniform(0.01, 0.4, (64, 64)).astype(np.float32)
    soft[10:20, 10:20] = 0.9  # the only true plume
    s = GranuleSample(channels=rng.random((64, 64, 2), np.float32).astype(
        np.float32), mask=soft)
    [(_, (ys, xs))] = _prep_samples([s], tile=32)
    assert ys.size == 100  # just the >0.5 block, not ~everything
    assert ys.min() == 10 and ys.max() == 19

    # uint8-coded (quantized) masks threshold in their own code
    q = GranuleSample(channels=s.channels,
                      mask=np.rint(soft * 255).astype(np.uint8))
    [(_, (qys, qxs))] = _prep_samples([q], tile=32)
    np.testing.assert_array_equal(qys, ys)
    np.testing.assert_array_equal(qxs, xs)


def test_distill_alpha_zero_skips_teacher(tmp_path):
    """alpha=0 must not restore the teacher or run inference — the labels
    are unchanged by construction."""
    from plumekit.train.distill import distill_samples

    samples = make_synthetic_dataset(DATA, train=True)
    hard = [s.mask.copy() for s in samples]
    # the checkpoint dir does not even exist: alpha=0 never touches it
    out = distill_samples(samples, str(tmp_path / "no_such_ckpt"),
                          alpha=0.0, infer_cfg=INFER)
    for s, h in zip(out, hard):
        np.testing.assert_array_equal(s.mask, h)


def test_distill_temperature_softens(tmp_path):
    from plumekit.train.distill import distill_samples

    ckpt = _train_teacher(tmp_path)
    samples = make_synthetic_dataset(DATA, train=True)
    p1 = distill_samples(samples, ckpt, alpha=1.0, temperature=1.0,
                         infer_cfg=INFER)
    p4 = distill_samples(samples, ckpt, alpha=1.0, temperature=4.0,
                         infer_cfg=INFER)
    # sigmoid(l/T) pulls every probability toward 0.5 for T > 1
    for a, b in zip(p1, p4):
        assert np.all(np.abs(b.mask - 0.5) <= np.abs(a.mask - 0.5) + 1e-6)
        assert np.mean(np.abs(b.mask - 0.5)) < np.mean(np.abs(a.mask - 0.5))


def test_distill_validation_errors(tmp_path):
    from plumekit.train.distill import distill_samples

    samples = make_synthetic_dataset(DATA, train=True)
    with pytest.raises(ValueError, match="alpha"):
        distill_samples(samples, str(tmp_path), alpha=1.5)
    with pytest.raises(ValueError, match="temperature"):
        distill_samples(samples, str(tmp_path), temperature=0.0)
    with pytest.raises(ValueError, match="model_config"):
        distill_samples(samples, str(tmp_path / "nowhere"), alpha=0.5)


def test_distill_channel_mismatch(tmp_path):
    from plumekit.train.data import GranuleSample
    from plumekit.train.distill import distill_samples

    ckpt = _train_teacher(tmp_path)
    bad = [GranuleSample(channels=np.zeros((96, 96, 3), np.float32),
                         mask=np.zeros((96, 96), np.float32))]
    with pytest.raises(ValueError, match="channels"):
        distill_samples(bad, ckpt, infer_cfg=INFER)


def test_train_with_distillation_end_to_end(tmp_path):
    """Full loop: teacher ckpt -> student trains on the blend; the dev set
    keeps hard labels so eval IoU stays comparable. Also composes with the
    quantized-transfer path (soft labels ride the uint8/255 mask codec)."""
    from plumekit.train.loop import train

    teacher = _train_teacher(tmp_path)
    hist = train(
        SMALL_UNET,
        TrainConfig(batch_size=2, tile_size=32, total_steps=4,
                    warmup_steps=2, checkpoint_every=4, log_every=4,
                    checkpoint_dir=str(tmp_path / "student"), augment=False,
                    quantize_transfer=True,
                    distill_from=teacher, distill_alpha=0.7,
                    distill_infer=InferConfig(tile_size=32, overlap=8,
                                              batch_tiles=4)),
        DATA)
    assert np.isfinite(hist["eval_iou"][-1])


def test_distill_unetpp_teacher_with_pruning(tmp_path):
    """A deep-supervised UNet++ teacher serves pruned at column 1 — the
    quality-pick teacher configuration BASELINE.md measures."""
    from plumekit.train.distill import distill_samples

    ckpt = _train_teacher(tmp_path, arch="unetpp", deep_supervision=True)
    samples = make_synthetic_dataset(DATA, train=True)
    out = distill_samples(samples, ckpt, alpha=1.0, prune_level=1,
                          infer_cfg=INFER)
    for s in out:
        assert np.all(s.mask >= 0.0) and np.all(s.mask <= 1.0)
        assert np.any((s.mask > 0.0) & (s.mask < 1.0))


def test_distill_calibrate_recenters(tmp_path):
    """calibrate_threshold=t* shifts probabilities by logit(t*):
    p' = sigmoid(logit(p) − logit(t*)) exactly, so pixels the teacher
    scores at t* land at 0.5 in the student's targets."""
    from plumekit.train.distill import distill_samples

    ckpt = _train_teacher(tmp_path)
    samples = make_synthetic_dataset(DATA, train=True)
    # overlap 0: the taper would otherwise blend AFTER the per-tile logit
    # shift and the closed-form check below would not commute
    flat = InferConfig(tile_size=32, overlap=0, batch_tiles=4)
    base = distill_samples(samples, ckpt, alpha=1.0, infer_cfg=flat)
    cal = distill_samples(samples, ckpt, alpha=1.0, infer_cfg=flat,
                          calibrate_threshold=0.7)
    shift = np.log(0.7 / 0.3)
    for b, c in zip(base, cal):
        p = np.clip(b.mask, 1e-6, 1 - 1e-6)
        expected = 1.0 / (1.0 + np.exp(-(np.log(p / (1 - p)) - shift)))
        np.testing.assert_allclose(c.mask, expected, atol=2e-4)
        # recentring strictly lowers every probability for t* > 0.5
        assert np.all(c.mask <= b.mask + 1e-6)
    with pytest.raises(ValueError, match="calibrate_threshold"):
        distill_samples(samples, ckpt, calibrate_threshold=1.0)


def test_distill_calibrate_composes_with_temperature(tmp_path):
    """Recentring happens BEFORE tempering — p' = sigmoid((z − logit(t*))/T)
    — so the teacher's calibrated operating point t* maps to exactly 0.5 at
    ANY temperature (the round-4 advisor finding: shift-after-divide put it
    at sigmoid(logit(t*)(1−T)/T) for T ≠ 1)."""
    from plumekit.train.distill import distill_samples

    ckpt = _train_teacher(tmp_path)
    samples = make_synthetic_dataset(DATA, train=True)
    flat = InferConfig(tile_size=32, overlap=0, batch_tiles=4)
    tstar, temp = 0.7, 4.0
    base = distill_samples(samples, ckpt, alpha=1.0, infer_cfg=flat)
    cal = distill_samples(samples, ckpt, alpha=1.0, infer_cfg=flat,
                          calibrate_threshold=tstar, temperature=temp)
    shift = np.log(tstar / (1 - tstar))
    for b, c in zip(base, cal):
        p = np.clip(b.mask, 1e-6, 1 - 1e-6)
        expected = 1.0 / (1.0 + np.exp(-(np.log(p / (1 - p)) - shift)
                                       / temp))
        np.testing.assert_allclose(c.mask, expected, atol=2e-4)
        # the invariant itself: pixels the teacher scored at t* land at
        # 0.5 in the tempered targets (sidedness preserved away from the
        # closed-form check's tolerance band)
        far = np.abs(b.mask - tstar) > 1e-3
        np.testing.assert_array_equal((c.mask > 0.5)[far],
                                      (b.mask > tstar)[far])


def test_distill_tta_matches_manual_d4_average(tmp_path):
    """tta=True labels equal the mean of the 8 dihedral relabelings done
    by hand through the same sliding infer (overlap 0 keeps the taper out
    so the views commute with stitching exactly)."""
    from plumekit.train.data import GranuleSample
    from plumekit.train.distill import distill_samples

    ckpt = _train_teacher(tmp_path)
    flat = InferConfig(tile_size=32, overlap=0, batch_tiles=4)
    samples = make_synthetic_dataset(DATA, train=True)[:1]

    got = distill_samples(samples, ckpt, alpha=1.0, infer_cfg=flat,
                          tta=True)[0].mask

    acc = np.zeros_like(samples[0].mask, np.float64)
    for f in (False, True):
        for k in range(4):
            ch = samples[0].channels
            v = np.flip(ch, axis=1) if f else ch
            v = np.rot90(v, k, axes=(0, 1))
            out = distill_samples(
                [GranuleSample(channels=np.ascontiguousarray(v),
                               mask=np.zeros(v.shape[:2], np.float32))],
                ckpt, alpha=1.0, infer_cfg=flat)[0].mask
            back = np.rot90(out, -k, axes=(0, 1))
            if f:
                back = np.flip(back, axis=1)
            acc += back
    np.testing.assert_allclose(got, acc / 8.0, atol=2e-5)
