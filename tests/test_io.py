"""IO tests: synthetic scenes, granule round-trips, fire tables, prefetch."""

import numpy as np
import pandas as pd

from plumekit.io import (
    Granule,
    load_granule,
    save_granule,
    make_scene,
    SyntheticSceneConfig,
    subset_fires_to_image,
    device_prefetch,
)
from plumekit.io.granule import NULL_VALUE


def test_make_scene_shapes(small_scene):
    g = small_scene.granule
    assert g.shape == (256, 256)
    assert g.lat.shape == (256, 256)
    assert small_scene.gt_labels.max() == 2
    assert len(small_scene.fires) >= 8
    # fires sit on/near plume origins: every fire within the scene bbox
    assert small_scene.fires.latitude.between(g.lat.min(), g.lat.max()).all()


def test_scene_determinism():
    a = make_scene(SyntheticSceneConfig(size=64, seed=3))
    b = make_scene(SyntheticSceneConfig(size=64, seed=3))
    np.testing.assert_array_equal(a.granule.first_layer(), b.granule.first_layer())
    pd.testing.assert_frame_equal(a.fires, b.fires)


def test_scene_null_blobs():
    s = make_scene(SyntheticSceneConfig(size=64, null_blobs=2, seed=5))
    assert (s.granule.first_layer() == NULL_VALUE).sum() > 0


def test_granule_roundtrip_npz(tmp_path, small_scene):
    p = str(tmp_path / "g.npz")
    save_granule(p, small_scene.granule)
    g = load_granule(p)
    assert set(g.layers) == set(small_scene.granule.layers)
    np.testing.assert_array_equal(g.first_layer(), small_scene.granule.first_layer())
    np.testing.assert_allclose(g.lat, small_scene.granule.lat)


def test_granule_roundtrip_h5(tmp_path, small_scene):
    p = str(tmp_path / "g.h5")
    save_granule(p, small_scene.granule)
    g = load_granule(p)
    np.testing.assert_array_equal(g.first_layer(), small_scene.granule.first_layer())


def test_subset_fires(small_scene):
    g = small_scene.granule
    date = small_scene.fires.date_time.iloc[0]
    sub = subset_fires_to_image(g.lat, g.lon, small_scene.fires, date)
    assert len(sub) == len(small_scene.fires)
    # wrong date -> empty
    sub2 = subset_fires_to_image(
        g.lat, g.lon, small_scene.fires, pd.Timestamp("1999-01-01")
    )
    assert len(sub2) == 0
    # FRP gate
    sub3 = subset_fires_to_image(g.lat, g.lon, small_scene.fires, date,
                                 min_frp=1e9)
    assert len(sub3) == 0


def test_device_prefetch_order_and_errors():
    items = [np.full((4,), i, dtype=np.float32) for i in range(10)]
    out = list(device_prefetch(iter(items), buffer_size=2))
    assert [int(o[0]) for o in out] == list(range(10))

    def bad():
        yield items[0]
        raise RuntimeError("decode failed")

    import pytest

    with pytest.raises(RuntimeError, match="decode failed"):
        list(device_prefetch(bad()))
