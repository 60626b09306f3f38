"""End-to-end identify tests: device pipeline vs a clean-room NumPy/scipy
oracle of the reference rg semantics (SURVEY.md §4 point 2), plus gaussian /
basic / blob / API smoke coverage on synthetic scenes.

Parity contract (BASELINE.json: "fp32 tolerance"): per-threshold plume
extents must match the oracle *exactly* (integer pixel counts); accept/reject
decisions and chosen masks must match except where a gate input sits within
fp32 rounding of the gate boundary (borderline find_peaks ripples) — bounded
here at ≤10% of fires, and any such divergent accept must still be the same
physical plume (IoU > 0.5 against the oracle mask).
"""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from plumekit.config.identify import (
    BasicIdentifyConfig,
    GaussianIdentifyConfig,
    RGIdentifyConfig,
)
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.identify.pipeline import cached_sweep_identifier
from plumekit.identify.rg import _statics, identify as rg_identify
from plumekit.identify import gaussian as gaussian_mod
from plumekit.identify import basic as basic_mod
from plumekit.identify.api import identify, PlumeSet
from plumekit.io import make_scene, SyntheticSceneConfig
from plumekit.io.fires import subset_fires_to_image
from plumekit.ops.cluster import mean_cluster_positions

from oracle_rg import oracle_identify

RG_CFG = RGIdentifyConfig(max_fires=8)

SCENE_KW = dict(
    size=256, n_plumes=3, background_level=0.2, background_noise=0.05,
    plume_amplitude=(0.6, 0.8), plume_sigma_major=(9.0, 14.0),
    plume_sigma_minor=(1.8, 2.6),
)


def _scene_fires(seed):
    scene = make_scene(SyntheticSceneConfig(seed=seed, **SCENE_KW))
    g = scene.granule
    aod = g.first_layer().astype(np.float64)
    date = scene.fires.date_time.iloc[0]
    sub = subset_fires_to_image(g.lat, g.lon, scene.fires, date,
                                min_frp=RG_CFG.min_frp)
    clusters = mean_cluster_positions(sub, RG_CFG.cluster_dist_km)
    rows, cols = locate_fires_in_image(
        clusters.latitude, clusters.longitude, g.lat, g.lon, RG_CFG.win_half
    )
    return scene, aod, rows, cols


def test_rg_parity_against_oracle():
    fn = cached_sweep_identifier(_statics(RG_CFG))
    thresholds = jnp.asarray(np.asarray(RG_CFG.thresholds, np.float32))

    total = agree = 0
    accepted_pairs = 0
    for seed in (21, 22, 23, 24, 25, 26, 27, 28):
        scene, aod, rows, cols = _scene_fires(seed)
        oracle, extents = oracle_identify(aod, rows, cols, RG_CFG)

        fr, fc, fv = pad_fires(rows, cols, RG_CFG.max_fires)
        aj = jnp.asarray(aod, jnp.float32)
        out = fn(aj, aj, jnp.zeros(aod.shape, bool), thresholds,
                 jnp.asarray(fr), jnp.asarray(fc), jnp.asarray(fv))
        out = {k: np.asarray(v) for k, v in out.items()}

        # hard contract: integer extents identical at every (threshold, fire)
        np.testing.assert_array_equal(
            out["extents"][:, : len(rows)], extents
        )

        for i in range(len(rows)):
            total += 1
            o = oracle[i]
            d_acc = bool(out["accepted"][i])
            if (o is not None) == d_acc:
                if o is not None and np.array_equal(out["mask"][i], o["mask"]):
                    agree += 1
                    accepted_pairs += 1
                elif o is None:
                    agree += 1
                else:
                    # both accepted, mask differs: must be the same plume
                    inter = (out["mask"][i] & o["mask"]).sum()
                    union = (out["mask"][i] | o["mask"]).sum()
                    assert inter / union > 0.5
            else:
                # decision flip: tolerated only within the fp32 budget below
                pass

    assert accepted_pairs >= 3, "acceptance path not exercised"
    assert agree / total >= 0.8, f"agreement {agree}/{total} below fp32 budget"


def test_rg_identify_dataframes():
    scene, aod, rows, cols = _scene_fires(25)
    g = scene.granule
    date = scene.fires.date_time.iloc[0]
    aod_df, hull_df, out = rg_identify(
        aod.astype(np.float32), g.lat, g.lon, date, scene.fires, RG_CFG
    )
    assert list(aod_df.columns) == [
        "id", "plume_pixel_extent", "plume_min_row", "plume_max_row",
        "plume_min_col", "plume_max_col", "plume_aod_mean", "plume_aod_sd",
        "bg_aod_level",
    ]
    assert len(aod_df) >= 1
    assert set(hull_df.columns) == {"id", "hull_lats", "hull_lons",
                                    "hull_x", "hull_y"}
    assert hull_df.id.isin(aod_df.id).all()
    # hull pixel coords inside the image; lats within grid range
    assert hull_df.hull_x.between(0, 255).all()
    assert hull_df.hull_lats.between(g.lat.min(), g.lat.max()).all()
    # accepted plumes overlap ground truth
    for f, mask in zip(np.nonzero(out["accepted"])[0],
                       out["mask"][out["accepted"]]):
        inter = (mask & scene.gt_mask).sum()
        assert inter / mask.sum() > 0.5


def test_rg_empty_fires():
    scene, aod, rows, cols = _scene_fires(25)
    g = scene.granule
    empty = scene.fires.iloc[0:0]
    aod_df, hull_df, _ = rg_identify(
        aod.astype(np.float32), g.lat, g.lon,
        pd.Timestamp("2017-08-01"), empty, RG_CFG
    )
    assert len(aod_df) == 0 and len(hull_df) == 0


GAUSS_CFG = GaussianIdentifyConfig(max_fires=16)


def test_gaussian_identify_granule():
    # >= 20 locatable fires (min_fires_per_scene gate), some nulls, and TWO
    # orbit layers (the gaussian main loops every layer,
    # plume_identifier_gaussian_profile.py:608)
    sc = SyntheticSceneConfig(
        seed=31, size=256, n_plumes=3, n_layers=2, background_level=0.2,
        background_noise=0.05, plume_amplitude=(0.6, 0.8),
        plume_sigma_major=(9.0, 14.0), plume_sigma_minor=(1.8, 2.6),
        fires_per_plume=(7, 9), extra_fires=6, null_blobs=2,
    )
    scene = make_scene(sc)
    date = scene.fires.date_time.iloc[0]
    hull_df = gaussian_mod.identify_granule(
        scene.granule, scene.fires, date, GAUSS_CFG
    )
    assert set(hull_df.columns) >= {"id", "hull_lats", "hull_lons", "hull_x",
                                    "hull_y", "datetime"}
    if len(hull_df):
        assert hull_df.hull_x.between(0, 255).all()
        # ids unique per (scale-run) and increasing
        assert hull_df.id.min() >= 0


def test_gaussian_min_fires_gate():
    kw = dict(SCENE_KW, n_plumes=1)  # ≤ 9 fires < min_fires_per_scene=20
    scene = make_scene(SyntheticSceneConfig(seed=32, **kw))
    date = scene.fires.date_time.iloc[0]
    hull_df = gaussian_mod.identify_granule(
        scene.granule, scene.fires, date, GAUSS_CFG
    )
    assert hull_df.empty


BASIC_CFG = BasicIdentifyConfig(max_fires=8)


def test_basic_identify():
    scene = make_scene(SyntheticSceneConfig(seed=41, **SCENE_KW))
    g = scene.granule
    aod = g.first_layer().copy()
    aod[aod < 0] = 0
    date = scene.fires.date_time.iloc[0]
    plume_dict, plume_image = basic_mod.identify(
        aod, g.lat, g.lon, date, scene.fires, BASIC_CFG
    )
    assert isinstance(plume_dict, dict)
    for pid, bb in plume_dict.items():
        assert bb["max_r"] > bb["min_r"] and bb["max_c"] > bb["min_c"]
        sub = scene.gt_mask[bb["min_r"]:bb["max_r"], bb["min_c"]:bb["max_c"]]
        assert sub.any()  # bbox overlaps a real plume
    if plume_dict:
        assert (np.asarray(plume_image) > 0).sum() > 0


def test_api_dispatch():
    scene = make_scene(SyntheticSceneConfig(seed=25, **SCENE_KW))
    date = scene.fires.date_time.iloc[0]
    ps = identify(scene.granule, scene.fires, date, RG_CFG)
    assert isinstance(ps, PlumeSet)
    assert len(ps) == len(ps.aod_stats)
    # masks are keyed by PLUME id (the dataframe ids), not fire slot —
    # keys must match aod_stats exactly (degenerate-hull drops and dedup
    # both shift plume ids off the accepted-fire enumeration)
    assert set(ps.masks) == set(int(i) for i in ps.aod_stats.id)
    for mask in ps.masks.values():
        assert mask.shape == (256, 256)

    ps_b = identify(scene.granule, scene.fires, date, BASIC_CFG)
    assert ps_b.labelled_image is not None

    with pytest.raises(TypeError):
        identify(scene.granule, scene.fires, date, cfg=42)


def test_blob_detectors_smoke():
    from plumekit.identify.blob import blob_log, blob_dog, blob_doh
    from plumekit.config.identify import BlobIdentifyConfig

    scene = make_scene(SyntheticSceneConfig(seed=5, size=128, n_plumes=2))
    aod = scene.granule.first_layer()
    cfg = BlobIdentifyConfig(max_sigma=15.0, num_sigma=5)
    for det in (blob_log, blob_dog, blob_doh):
        blobs = det(aod, cfg)
        assert blobs.ndim == 2 and blobs.shape[1] == 3
        if len(blobs):
            assert (blobs[:, 0] >= 0).all() and (blobs[:, 0] < 128).all()


def test_fire_bucketing_capacity_and_equivalence():
    """Round 5: pad_fires(bucket=True) shrinks capacity to the next power
    of two (floor 8, cap = config max) and the sweep outputs for VALID
    fires are unchanged vs the full-capacity padding."""
    import numpy as np

    from plumekit.identify.locate import fire_bucket, pad_fires

    assert fire_bucket(0, 64) == 8
    assert fire_bucket(7, 64) == 8
    assert fire_bucket(9, 64) == 16
    assert fire_bucket(13, 64) == 16
    assert fire_bucket(33, 64) == 64
    assert fire_bucket(200, 64) == 64
    r = np.arange(13, dtype=np.int32)
    fr, fc, fv = pad_fires(r, r, 64, bucket=True)
    assert fr.shape == (16,) and fv.sum() == 13
    fr2, fc2, fv2 = pad_fires(r, r, 64)
    assert fr2.shape == (64,)
    np.testing.assert_array_equal(fr[:13], fr2[:13])
