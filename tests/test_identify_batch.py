"""Data-parallel batch identify over the virtual 8-device mesh: sharded
results must equal the per-granule single-device pipeline exactly."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from plumekit.config.identify import RGIdentifyConfig
from plumekit.config.train import MeshConfig
from plumekit.identify.locate import locate_fires_in_image, pad_fires
from plumekit.identify.batch import batch_identify_sharded
from plumekit.identify.pipeline import cached_sweep_identifier
from plumekit.identify.rg import _statics
from plumekit.io.fires import subset_fires_to_image
from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
from plumekit.ops.cluster import mean_cluster_positions
from plumekit.parallel import make_mesh


def test_batch_identify_matches_single_device():
    cfg = RGIdentifyConfig(max_fires=8)
    statics = _statics(cfg)
    mesh = make_mesh(MeshConfig(data=8))

    aods, rows_l, cols_l, valid_l = [], [], [], []
    for i in range(6):  # 6 granules -> pads to 8 (2 empty scenes dropped)
        scene = make_scene(SyntheticSceneConfig(
            size=96, n_plumes=2, seed=50 + i, fires_per_plume=(5, 7),
            plume_sigma_major=(8.0, 11.0), plume_sigma_minor=(1.6, 2.2),
        ))
        g = scene.granule
        sub = subset_fires_to_image(g.lat, g.lon, scene.fires,
                                    scene.fires.date_time.iloc[0],
                                    min_frp=cfg.min_frp)
        cl = mean_cluster_positions(sub, cfg.cluster_dist_km)
        r, c = locate_fires_in_image(cl.latitude, cl.longitude, g.lat,
                                     g.lon, cfg.win_half)
        fr, fc, fv = pad_fires(r, c, cfg.max_fires)
        aods.append(g.first_layer())
        rows_l.append(fr)
        cols_l.append(fc)
        valid_l.append(fv)

    out = batch_identify_sharded(
        np.stack(aods), statics, cfg.thresholds, np.stack(rows_l),
        np.stack(cols_l), np.stack(valid_l), mesh,
    )
    assert out["accepted"].shape[0] == 6

    fn = cached_sweep_identifier(statics)
    th = jnp.asarray(np.asarray(cfg.thresholds, np.float32))
    for i in range(6):
        ref = fn(jnp.asarray(aods[i]), jnp.asarray(aods[i]),
                 jnp.zeros(aods[i].shape, bool), th,
                 jnp.asarray(rows_l[i]), jnp.asarray(cols_l[i]),
                 jnp.asarray(valid_l[i]))
        np.testing.assert_array_equal(out["accepted"][i],
                                      np.asarray(ref["accepted"]))
        np.testing.assert_array_equal(out["extents"][i],
                                      np.asarray(ref["extents"]))
        np.testing.assert_array_equal(out["mask"][i],
                                      np.asarray(ref["mask"]))
