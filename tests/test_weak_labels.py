"""Weak-label dataset: the classical identify pipeline as labeller
(SURVEY.md §0 — the reference's actual role for the identifiers)."""

import numpy as np

from plumekit.config.train import DataConfig
from plumekit.train import make_weak_label_dataset
from plumekit.train.data import make_scene
from plumekit.io.synthetic import SyntheticSceneConfig


def test_weak_label_dataset_overlaps_ground_truth():
    dcfg = DataConfig(granule_size=256, n_train_granules=3, seed=4243)
    samples = make_weak_label_dataset(dcfg, train=True)
    assert len(samples) == 3
    total_pos = sum(int(s.mask.sum()) for s in samples)
    assert total_pos > 0, "weak labeller found no plumes on any granule"
    # weak labels must sit on real (GT) plumes wherever present
    for i, s in enumerate(samples):
        scene = make_scene(
            SyntheticSceneConfig(
                size=256, n_plumes=3, seed=4243 + i,
                background_level=0.2, background_noise=0.05,
                plume_amplitude=(0.6, 0.9), plume_sigma_major=(9.0, 16.0),
                plume_sigma_minor=(1.8, 2.8), fires_per_plume=(5, 8),
            )
        )
        if s.mask.sum():
            inter = (s.mask.astype(bool) & scene.gt_mask).sum()
            precision = inter / s.mask.sum()
            assert precision > 0.5, f"granule {i}: weak labels off-plume"
