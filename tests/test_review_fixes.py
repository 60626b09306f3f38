"""Regression tests for the round-2 code-review fixes.

Each test pins one reviewed failure mode: silent wrong labels from
unvalidated thresholds, Mosaic crashes on oversized CCL scenes, wrong-orbit
curated samples, crashes on degenerate fire CSVs, granule-probe drift, and
the prefetch producer leak on abandoned streams.
"""

import os
import time

import numpy as np
import pandas as pd
import pytest

import jax


def test_batch_identify_rejects_ascending_thresholds():
    from jax.sharding import Mesh
    from plumekit.identify.batch import batch_identify_sharded
    from plumekit.identify.pipeline import SweepStatics

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    statics = SweepStatics(win_half=8, min_plume_pixels=2,
                           max_plume_pixels=500, max_lim=0.1,
                           axis_ratio=1.0, max_peaks=3, n_transect=16)
    with pytest.raises(ValueError, match="descending"):
        batch_identify_sharded(
            np.zeros((1, 32, 32), np.float32), statics,
            (0.1, 0.2, 0.3),                      # ascending: must raise
            np.zeros((1, 4), np.int32), np.zeros((1, 4), np.int32),
            np.zeros((1, 4), bool), mesh)


def test_ccl_sweep_vmem_gate():
    from plumekit.ops.pallas.ccl_sweep import sweep_fits_vmem

    assert sweep_fits_vmem(1200, 1200)            # MAIAC native size
    assert sweep_fits_vmem(2048, 2048)            # bench granule
    assert not sweep_fits_vmem(9000, 9000)        # beyond the budget
    # the identify pipeline consults the gate instead of crashing in
    # Mosaic; the XLA path handles any size


def test_ccl_sweep_block_validation():
    from plumekit.ops.pallas.ccl_sweep import multi_threshold_ccl

    with pytest.raises(ValueError, match="multiple of 8"):
        multi_threshold_ccl(np.zeros((1, 64, 64), bool), block=100,
                            interpret=True)


def test_curated_rejects_unknown_orbit_timestamp():
    from plumekit.io.granule import Granule
    from plumekit.train.curated import granule_to_channels

    lat, lon = np.zeros((16, 16)), np.zeros((16, 16))
    multi = Granule(layers={"t1": np.zeros((16, 16), np.float32),
                            "t2": np.zeros((16, 16), np.float32)},
                    lat=lat, lon=lon, name="g")
    with pytest.raises(ValueError, match="not among granule layers"):
        granule_to_channels(multi, "t3", None)
    # single-layer granules accept the selector's sentinel timestamp
    single = Granule(layers={"t1": np.zeros((16, 16), np.float32)},
                     lat=lat, lon=lon, name="g")
    out = granule_to_channels(single, "layer0", None)
    assert out.shape == (16, 16, 2)


def test_find_granule_covers_all_serialisations(tmp_path):
    from plumekit.io.granule import (Granule, find_granule, save_granule)

    g = Granule(layers={"t": np.zeros((8, 8), np.float32)},
                lat=np.zeros((8, 8)), lon=np.zeros((8, 8)), name="g")
    save_granule(str(tmp_path / "a.hdf5"), g)     # the ext the old probe
    assert find_granule(str(tmp_path), "a") is not None   # lists missed
    assert find_granule(str(tmp_path), "missing") is None


def test_build_model_data_tolerates_empty_fire_csv(tmp_path):
    from plumekit.config import PathsConfig
    from plumekit.io.granule import Granule, save_granule
    from plumekit.train.curated import build_model_data

    paths = PathsConfig(root=str(tmp_path))
    hull_dir = paths.ensure("reduced_plume_hull_dir")
    maiac_dir = paths.ensure("maiac_dir")
    fires_dir = paths.ensure("fires_dir")
    # header-only fire CSV (no detections in the period)
    pd.DataFrame(columns=["latitude", "longitude", "frp",
                          "acq_date"]).to_csv(
        os.path.join(fires_dir, "fires.csv"), index=False)
    g = Granule(layers={"t": np.random.rand(32, 32).astype(np.float32)},
                lat=np.zeros((32, 32)), lon=np.zeros((32, 32)), name="g1")
    save_granule(os.path.join(maiac_dir, "g1.npz"), g)
    pd.DataFrame({"id": [0] * 3, "hull_x": [4.0, 10.0, 4.0],
                  "hull_y": [4.0, 4.0, 10.0],
                  "datetime": ["t"] * 3}).to_csv(
        os.path.join(hull_dir, "g1_extent.csv"), index=False)

    written = build_model_data(paths)             # must not IndexError
    assert len(written) == 1
    data = np.load(written[0])
    assert data["mask"].sum() > 0


def test_device_prefetch_releases_producer_on_abandon():
    from plumekit.io.prefetch import device_prefetch

    produced = []

    def src():
        for i in range(100):
            produced.append(i)
            yield i

    stream = device_prefetch(src(), buffer_size=2,
                             device_put=lambda x: x)
    next(stream)
    stream.close()                  # abandon: must unblock the producer
    time.sleep(0.6)                 # > the producer's put timeout
    n = len(produced)
    time.sleep(0.4)
    assert len(produced) == n       # producer stopped, not spinning on
    assert n < 100                  # never drained the whole source
