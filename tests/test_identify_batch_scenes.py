"""Single-device multi-scene identify (identify_batch / --batch-scenes):
per-scene results must be IDENTICAL to the serial identify — same sweep
body, lax.map-ped — including dataframes and per-plume device masks."""

import numpy as np
import pandas as pd
import pytest

from plumekit.config.identify import RGIdentifyConfig
from plumekit.identify.rg import identify as rg_identify, identify_batch
from plumekit.io import make_scene, SyntheticSceneConfig

CFG = RGIdentifyConfig(max_fires=8)
SCENE_KW = dict(
    size=256, n_plumes=3, background_level=0.2, background_noise=0.05,
    plume_amplitude=(0.6, 0.8), plume_sigma_major=(9.0, 14.0),
    plume_sigma_minor=(1.8, 2.6),
)


def _scenes(seeds):
    out = []
    for seed in seeds:
        scene = make_scene(SyntheticSceneConfig(seed=seed, **SCENE_KW))
        g = scene.granule
        out.append((g.first_layer().astype(np.float32), g.lat, g.lon,
                    scene.fires.date_time.iloc[0], scene.fires))
    return out


def test_identify_batch_matches_serial():
    scenes = _scenes((25, 27, 28))
    fire_df = pd.concat([s[4] for s in scenes], ignore_index=True)

    serial = [rg_identify(aod, lat, lon, date, fire_df, CFG)
              for aod, lat, lon, date, _ in scenes]
    batched = identify_batch([(aod, lat, lon, date)
                              for aod, lat, lon, date, _ in scenes],
                             fire_df, CFG)

    assert sum(len(r[0]) for r in serial) > 0  # something was detected
    for (a_s, h_s, o_s), (a_b, h_b, o_b) in zip(serial, batched):
        pd.testing.assert_frame_equal(a_s.reset_index(drop=True),
                                      a_b.reset_index(drop=True))
        pd.testing.assert_frame_equal(h_s.reset_index(drop=True),
                                      h_b.reset_index(drop=True))
        assert set(o_s["plume_masks"]) == set(o_b["plume_masks"])
        for pid, m in o_s["plume_masks"].items():
            np.testing.assert_array_equal(m, o_b["plume_masks"][pid])


def test_identify_batch_rejects_mixed_shapes():
    scenes = _scenes((25,))
    aod, lat, lon, date, fire_df = scenes[0]
    small = aod[:128, :128]
    with pytest.raises(ValueError, match="same-shape"):
        identify_batch([(aod, lat, lon, date),
                        (small, lat[:128, :128], lon[:128, :128], date)],
                       fire_df, CFG)


def test_build_features_batch_scenes_cli(tmp_path):
    """--batch-scenes 2 writes the same artifact set as the serial CLI
    (grouping, flushing, WorkLog marks)."""
    import os

    from plumekit.cli import main

    root_a = str(tmp_path / "serial")
    root_b = str(tmp_path / "batched")
    for root in (root_a, root_b):
        assert main(["make_dataset", "--root", root, "--n-granules", "3",
                     "--size", "256", "--seed", "11"]) == 0
    assert main(["build_features", "--root", root_a]) == 0
    assert main(["build_features", "--root", root_b,
                 "--batch-scenes", "2"]) == 0

    rel = "raw/plume_identification/dataframes/full/hull"
    files_a = sorted(os.listdir(os.path.join(root_a, rel)))
    files_b = sorted(os.listdir(os.path.join(root_b, rel)))
    assert files_a == files_b and len(files_a) == 3
    for f in files_a:
        df_a = pd.read_csv(os.path.join(root_a, rel, f))
        df_b = pd.read_csv(os.path.join(root_b, rel, f))
        pd.testing.assert_frame_equal(df_a, df_b)


def test_build_features_batch_scenes_wrong_detector(tmp_path):
    from plumekit.cli import main

    root = str(tmp_path)
    assert main(["make_dataset", "--root", root, "--n-granules", "1",
                 "--size", "128"]) == 0
    assert main(["build_features", "--root", root, "--detector", "basic",
                 "--batch-scenes", "2"]) == 1


def test_identify_batch_mixed_fire_buckets():
    """Scenes whose per-scene fire BUCKETS differ (round 5: the serial
    driver buckets each scene's capacity; the batch driver must re-pad
    to one shared bucket or the stack would fail) still match serial
    bit-for-bit."""
    cfg = RGIdentifyConfig(max_fires=64)
    few = make_scene(SyntheticSceneConfig(seed=31, **SCENE_KW))
    many = make_scene(SyntheticSceneConfig(
        seed=33, **{**SCENE_KW, "n_plumes": 3, "extra_fires": 30}))
    scenes = []
    for scene in (few, many):
        g = scene.granule
        scenes.append((g.first_layer().astype(np.float32), g.lat, g.lon,
                       scene.fires.date_time.iloc[0], scene.fires))
    fire_df = pd.concat([s[4] for s in scenes], ignore_index=True)

    serial = [rg_identify(aod, lat, lon, date, fire_df, cfg)
              for aod, lat, lon, date, _ in scenes]
    batched = identify_batch([(aod, lat, lon, date)
                              for aod, lat, lon, date, _ in scenes],
                             fire_df, cfg)
    for (a_s, h_s, o_s), (a_b, h_b, o_b) in zip(serial, batched):
        pd.testing.assert_frame_equal(a_s.reset_index(drop=True),
                                      a_b.reset_index(drop=True))
        pd.testing.assert_frame_equal(h_s.reset_index(drop=True),
                                      h_b.reset_index(drop=True))
