"""Gaussian-profile detector: device pipeline vs clean-room oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from plumekit.config.identify import GaussianIdentifyConfig
from plumekit.identify.gaussian import _statics
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.identify.pipeline import cached_sweep_identifier
from plumekit.io import make_scene, SyntheticSceneConfig
from plumekit.io.fires import subset_fires_to_image
from plumekit.ops.cluster import raster_cluster_centroids
from plumekit.ops.inpaint import nearest_fill

from oracle_gaussian import oracle_identify_layer

CFG = GaussianIdentifyConfig(max_fires=32)

SCENE_KW = dict(
    size=256, n_plumes=3, background_level=0.2, background_noise=0.05,
    plume_amplitude=(0.6, 0.8), plume_sigma_major=(9.0, 14.0),
    plume_sigma_minor=(1.8, 2.6), fires_per_plume=(7, 9),
)


def _device_layer(aod_raw, rows, cols):
    null_mask = aod_raw == CFG.null_value
    aod_i = nearest_fill(jnp.asarray(aod_raw, jnp.float32),
                         jnp.asarray(null_mask))
    fr, fc, fv = pad_fires(rows, cols, CFG.max_fires)
    cr, cc, cvalid = raster_cluster_centroids(
        aod_raw.shape, jnp.asarray(fr), jnp.asarray(fc), jnp.asarray(fv),
        CFG.min_fire_cluster_px,
    )
    fn = cached_sweep_identifier(_statics(CFG))
    outs = []
    for thresholds in CFG.threshold_sets():
        out = fn(aod_i, aod_i, jnp.asarray(null_mask),
                 jnp.asarray(np.asarray(thresholds, np.float32)),
                 cr, cc, cvalid)
        outs.append({k: np.asarray(v) for k, v in out.items()})
    return outs, (np.asarray(cr), np.asarray(cc), np.asarray(cvalid)), \
        np.asarray(aod_i)


@pytest.mark.parametrize("seed,null_blobs", [(51, 0), (52, 0), (53, 2)])
def test_gaussian_parity(seed, null_blobs):
    scene = make_scene(
        SyntheticSceneConfig(seed=seed, null_blobs=null_blobs, **SCENE_KW)
    )
    g = scene.granule
    aod = g.first_layer().astype(np.float64)
    date = scene.fires.date_time.iloc[0]
    sub = subset_fires_to_image(g.lat, g.lon, scene.fires, date)
    rows, cols = locate_fires_in_image(sub.latitude, sub.longitude, g.lat,
                                       g.lon, CFG.win_half)

    scales_o, (o_rows, o_cols), aod_o, _ = oracle_identify_layer(
        aod, rows, cols, CFG
    )
    outs_d, (d_rows, d_cols, d_valid), aod_d = _device_layer(
        aod.astype(np.float32), rows, cols
    )

    # cluster sets must match exactly (integer centroids)
    o_set = set(zip(o_rows.tolist(), o_cols.tolist()))
    d_set = set(zip(d_rows[d_valid].tolist(), d_cols[d_valid].tolist()))
    assert o_set == d_set and len(o_set) >= 2

    # map device lane -> oracle cluster index
    lane_of = {
        (int(r), int(c)): i
        for i, (r, c, v) in enumerate(zip(d_rows, d_cols, d_valid)) if v
    }

    exact = null_blobs == 0  # with nulls, JFA vs kd-tree ties may differ
    total = agree = accepted = 0
    for (extents_o, results_o), out_d in zip(scales_o, outs_d):
        for oi, (r, c) in enumerate(zip(o_rows, o_cols)):
            di = lane_of[(int(r), int(c))]
            if exact:
                np.testing.assert_array_equal(
                    out_d["extents"][:, di], extents_o[:, oi]
                )
            total += 1
            o_res = results_o[oi]
            d_acc = bool(out_d["accepted"][di])
            if (o_res is not None) == d_acc:
                agree += 1
                if o_res is not None:
                    accepted += 1
                    same = np.array_equal(out_d["mask"][di], o_res["mask"])
                    if exact:
                        assert same
                    else:
                        inter = (out_d["mask"][di] & o_res["mask"]).sum()
                        union = (out_d["mask"][di] | o_res["mask"]).sum()
                        assert inter / union > 0.95
    assert agree / total >= 0.85, (agree, total)


def test_gaussian_parity_finds_plumes():
    # at least one scene/scale must accept a plume so the accept path is
    # covered (guard against silently-all-reject parity)
    found = 0
    for seed in (51, 52):
        scene = make_scene(SyntheticSceneConfig(seed=seed, **SCENE_KW))
        g = scene.granule
        aod = g.first_layer().astype(np.float64)
        date = scene.fires.date_time.iloc[0]
        sub = subset_fires_to_image(g.lat, g.lon, scene.fires, date)
        rows, cols = locate_fires_in_image(sub.latitude, sub.longitude,
                                           g.lat, g.lon, CFG.win_half)
        scales_o, _, _, _ = oracle_identify_layer(aod, rows, cols, CFG)
        for _, results in scales_o:
            found += sum(r is not None for r in results)
    assert found >= 1
