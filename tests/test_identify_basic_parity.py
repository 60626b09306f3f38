"""Basic detector: device pipeline vs clean-room oracle."""

import numpy as np
import pytest

from plumekit.config.identify import BasicIdentifyConfig
from plumekit.identify import basic as basic_mod
from plumekit.identify.locate import locate_fires_in_image
from plumekit.io import make_scene, SyntheticSceneConfig
from plumekit.io.fires import subset_fires_to_image
from plumekit.ops.cluster import mean_cluster_positions

from oracle_basic import oracle_basic_identify

CFG = BasicIdentifyConfig(max_fires=16)

SCENE_KW = dict(
    size=256, background_level=0.05, background_noise=0.02,
    plume_amplitude=(0.5, 0.8), plume_sigma_major=(9.0, 14.0),
    plume_sigma_minor=(2.0, 3.0),
)


@pytest.mark.parametrize("seed", [61, 62, 63])
def test_basic_parity(seed):
    scene = make_scene(SyntheticSceneConfig(seed=seed, n_plumes=3, **SCENE_KW))
    g = scene.granule
    aod = g.first_layer().astype(np.float64).copy()
    aod[aod < 0] = 0.0
    date = scene.fires.date_time.iloc[0]
    sub = subset_fires_to_image(g.lat, g.lon, scene.fires, date,
                                min_frp=CFG.min_frp)
    clusters = mean_cluster_positions(sub, CFG.cluster_dist_km)
    rows, cols = locate_fires_in_image(clusters.latitude, clusters.longitude,
                                       g.lat, g.lon, CFG.win_half)

    o_dict, o_img = oracle_basic_identify(aod, rows, cols, CFG)
    d_dict, d_img = basic_mod.identify(
        aod.astype(np.float32), g.lat, g.lon, date, scene.fires, CFG
    )

    # identical surviving-plume pixel sets
    np.testing.assert_array_equal(np.asarray(d_img) > 0, o_img > 0)
    # identical bbox sets (ids may differ)
    o_boxes = sorted(tuple(v.values()) for v in o_dict.values())
    d_boxes = sorted(tuple(v.values()) for v in d_dict.values())
    assert d_boxes == o_boxes


def test_basic_parity_finds_plumes():
    found = 0
    for seed in (61, 62, 63):
        scene = make_scene(
            SyntheticSceneConfig(seed=seed, n_plumes=3, **SCENE_KW)
        )
        g = scene.granule
        aod = g.first_layer().astype(np.float64).copy()
        aod[aod < 0] = 0.0
        date = scene.fires.date_time.iloc[0]
        sub = subset_fires_to_image(g.lat, g.lon, scene.fires, date,
                                    min_frp=CFG.min_frp)
        clusters = mean_cluster_positions(sub, CFG.cluster_dist_km)
        rows, cols = locate_fires_in_image(
            clusters.latitude, clusters.longitude, g.lat, g.lon, CFG.win_half
        )
        o_dict, _ = oracle_basic_identify(aod, rows, cols, CFG)
        found += len(o_dict)
    assert found >= 1, "no basic-detector plumes on any test scene"


def test_basic_parity_null_contaminated_windows():
    """Null (-999) pixels inside a fire's 21x21 window drive the subwindow
    min mean negative -> the reference's ratio test fails -> fire dropped
    (plume_identifier_basic.py:196-205). Device == oracle on a nulled scene."""
    scene = make_scene(SyntheticSceneConfig(seed=71, n_plumes=3,
                                            null_blobs=6, null_blob_sigma=8.0,
                                            **SCENE_KW))
    g = scene.granule
    aod = g.first_layer().astype(np.float64)  # keep -999 nulls
    date = scene.fires.date_time.iloc[0]
    sub = subset_fires_to_image(g.lat, g.lon, scene.fires, date,
                                min_frp=CFG.min_frp)
    clusters = mean_cluster_positions(sub, CFG.cluster_dist_km)
    rows, cols = locate_fires_in_image(clusters.latitude, clusters.longitude,
                                       g.lat, g.lon, CFG.win_half)

    o_dict, o_img = oracle_basic_identify(aod, rows, cols, CFG)
    d_dict, d_img = basic_mod.identify(
        aod.astype(np.float32), g.lat, g.lon, date, scene.fires, CFG
    )
    np.testing.assert_array_equal(np.asarray(d_img) > 0, o_img > 0)
    o_boxes = sorted(tuple(v.values()) for v in o_dict.values())
    d_boxes = sorted(tuple(v.values()) for v in d_dict.values())
    assert d_boxes == o_boxes
