"""The reference notebook's IVAOT/GMTCO workflow, end-to-end on synthetic
fixtures ("Identifying plumes from AOD and Active Fires", cells 4-25):
h5 layout readers, granule pairing, masked-source UTM resample, and the
basic detector finding the planted plume on the resampled grid."""

from __future__ import annotations

import datetime
import os

import numpy as np
import pytest

from plumekit.io.viirs_aod import (
    GMTCO_LAT,
    GMTCO_LON,
    IVAOT_DATASET,
    GranuleStamp,
    format_granule_filename,
    identify_viirs_aod,
    make_synthetic_ivaot_scene,
    pair_granules,
    parse_granule_filename,
    resample_viirs_aod,
    write_synthetic_pair,
)


def test_stamp_parse_notebook_filenames():
    """The exact filenames from notebook cell 4 parse and pair."""
    aod = ("IVAOT_npp_d20160822_t1702001_e1703242_b24974"
           "_c20181017161815133750_noaa_ops.h5")
    geo = ("GMTCO_npp_d20160822_t1702001_e1703242_b24974"
           "_c20181019184439006772_noaa_ops.h5")
    sa, sg = parse_granule_filename(aod), parse_granule_filename(geo)
    assert sa.product == "IVAOT" and sg.product == "GMTCO"
    assert sa.platform == "npp"
    assert sa.date == datetime.date(2016, 8, 22)
    assert sa.orbit == 24974
    assert sa.key == sg.key  # creation stamps differ, identity matches
    assert parse_granule_filename("notagranule.h5") is None


def test_stamp_format_roundtrip():
    st = GranuleStamp("IVAOT", "npp", datetime.date(2016, 8, 22),
                      "1702001", "1703242", 24974)
    assert parse_granule_filename(format_granule_filename(st)) == st


@pytest.fixture(scope="module")
def scene_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("viirs_aod")
    aod_dir, geo_dir = str(d / "aod"), str(d / "geo")
    os.makedirs(aod_dir)
    os.makedirs(geo_dir)
    stamp, aod, lat, lon, fire_df, origins = make_synthetic_ivaot_scene(
        seed=1)
    write_synthetic_pair(aod_dir, geo_dir, stamp, aod, lat, lon)
    return dict(aod_dir=aod_dir, geo_dir=geo_dir, stamp=stamp, aod=aod,
                lat=lat, lon=lon, fires=fire_df, origins=origins)


def test_h5_layout_matches_notebook(scene_dirs):
    """Fixture files expose exactly the dataset paths cell 6 reads."""
    import h5py

    pairs = pair_granules(scene_dirs["aod_dir"], scene_dirs["geo_dir"])
    assert len(pairs) == 1
    with h5py.File(pairs[0]["aod"], "r") as f:
        assert IVAOT_DATASET in f
        assert f[IVAOT_DATASET].shape == scene_dirs["aod"].shape
    with h5py.File(pairs[0]["geo"], "r") as f:
        assert GMTCO_LAT in f and GMTCO_LON in f


def test_pairing_skips_unmatched(scene_dirs, tmp_path):
    """An IVAOT with no GMTCO companion is skipped, not mispaired."""
    import shutil

    aod2 = str(tmp_path / "aod2")
    shutil.copytree(scene_dirs["aod_dir"], aod2)
    stamp2 = GranuleStamp("IVAOT", "npp", datetime.date(2016, 8, 23),
                          "0000001", "0001242", 99999)
    import h5py

    with h5py.File(os.path.join(aod2, format_granule_filename(stamp2)),
                   "w") as f:
        f.create_dataset(IVAOT_DATASET, data=np.zeros((4, 4), np.float32))
    pairs = pair_granules(aod2, scene_dirs["geo_dir"])
    assert len(pairs) == 1
    assert pairs[0]["stamp"].orbit == scene_dirs["stamp"].orbit


def test_masked_source_resample(scene_dirs):
    """Cells 9-10: fill pixels (aod < 0) never appear in the resampled
    raster — the nearest VALID swath pixel wins instead — and grid cells
    beyond the radius of influence are NaN."""
    aod, lat, lon = (scene_dirs["aod"], scene_dirs["lat"],
                     scene_dirs["lon"])
    _, aod_r, lat_grid, lon_grid = resample_viirs_aod(aod, lat, lon)
    finite = aod_r[np.isfinite(aod_r)]
    assert finite.size > 0
    assert (finite >= 0).all()          # no fill value leaked through
    assert np.isnan(aod_r).any()        # off-swath cells exist
    assert lat_grid.shape == aod_r.shape == lon_grid.shape
    # grid covers the swath
    assert lat_grid.min() <= lat.min() + 0.05
    assert lat_grid.max() >= lat.max() - 0.05


def test_identify_finds_planted_plume(scene_dirs):
    """Cells 13-25 end-to-end: the basic detector accepts the planted
    plume on the resampled raster and its bbox covers the fire cluster."""
    pairs = pair_granules(scene_dirs["aod_dir"], scene_dirs["geo_dir"])
    plume_dict, plume_image, aod_r, resampler = identify_viirs_aod(
        pairs[0]["aod"], pairs[0]["geo"], scene_dirs["fires"])
    assert len(plume_dict) >= 1
    assert (plume_image > 0).sum() >= 100   # min size gate in the detector

    # the fire cluster's grid location falls inside (or within the 21x21
    # association window of) an accepted plume bbox
    f = scene_dirs["fires"]
    utm = resampler.resample_points_to_utm(
        [f.latitude.mean()], [f.longitude.mean()])
    x, y = utm[0]
    col = int((x - resampler.extent[0]) / resampler.cell_x)
    row = int((resampler.extent[3] - y) / resampler.cell_y)
    hit = any(
        bbox["min_r"] - 10 <= row <= bbox["max_r"] + 10
        and bbox["min_c"] - 10 <= col <= bbox["max_c"] + 10
        for bbox in plume_dict.values()
    )
    assert hit


def test_cli_identify_viirs(tmp_path):
    """CLI drive: make_dataset --viirs-aod-pairs → identify_viirs writes
    bbox CSVs + mask npz under raw/viirs/masks."""
    from plumekit.cli import main

    root = str(tmp_path / "root")
    assert main(["make_dataset", "--root", root, "--n-granules", "1",
                 "--size", "128", "--viirs-aod-pairs", "1"]) == 0
    assert main(["identify_viirs", "--root", root]) == 0
    masks = os.listdir(os.path.join(root, "raw/viirs/masks"))
    csvs = [m for m in masks if m.endswith("_plumes.csv")]
    npzs = [m for m in masks if m.endswith("_mask.npz")]
    assert len(csvs) == 1 and len(npzs) == 1
    import pandas as pd

    df = pd.read_csv(os.path.join(root, "raw/viirs/masks", csvs[0]))
    assert list(df.columns) == ["plume_id", "min_r", "min_c", "max_r",
                                "max_c"]
    assert len(df) >= 1
    # resume semantics: second run skips (reference main() log pattern)
    assert main(["identify_viirs", "--root", root]) == 0


def test_geolocation_fills_do_not_corrupt_grid(scene_dirs):
    """GMTCO granules carry -999.3 lat/lon fill pixels (bow-tie deletion /
    scan edges). The grid geometry (zone, extent, size) must come from
    valid pixels only — an extent computed over projected fill values
    explodes to millions of cells (round-3 review finding)."""
    aod = scene_dirs["aod"].copy()
    lat = scene_dirs["lat"].copy()
    lon = scene_dirs["lon"].copy()
    _, clean, _, _ = resample_viirs_aod(aod, lat, lon)

    # plant IDPS-style fill geolocation on a scan edge
    lat[:2, :] = -999.3
    lon[:2, :] = -999.3
    _, filled, lat_g, lon_g = resample_viirs_aod(aod, lat, lon)

    # grid stays swath-sized (within the two lost rows), not exploded
    assert abs(filled.shape[0] - clean.shape[0]) <= 8
    assert abs(filled.shape[1] - clean.shape[1]) <= 8
    finite = filled[np.isfinite(filled)]
    assert finite.size > 0 and (finite >= 0).all()
    assert (np.abs(lat_g) <= 90).all() and (np.abs(lon_g) <= 180).all()


def test_resampler_all_invalid_source_degenerates_cleanly():
    """Every source pixel masked out -> an empty 1x1 plan, not a crash or
    a garbage-extent allocation."""
    from plumekit.geo.utm import UTMResampler

    lat, lon = np.mgrid[40:41:32j, -3:-2:32j]
    rs = UTMResampler(lat, lon, pixel_size=1000.0,
                      source_valid=np.zeros(lat.shape, bool))
    assert rs.valid.shape == (1, 1) and not rs.valid.any()
    out = np.asarray(rs.resample_image(np.ones(lat.shape, np.float32),
                                       fill_value=np.nan))
    assert np.isnan(out).all()


def test_resampler_near_degenerate_source_clamps_to_one_cell():
    """A valid set spanning under half a pixel (e.g. one surviving
    retrieval in a fill-heavy granule) must clamp to a >=1-cell grid with
    finite cell sizes, not round to a 0x0 grid with NaN geometry."""
    from plumekit.geo.utm import UTMResampler

    lat, lon = np.mgrid[40:41:32j, -3:-2:32j]
    valid = np.zeros(lat.shape, bool)
    valid[16, 16] = True  # single valid pixel: extent width/height == 0
    rs = UTMResampler(lat, lon, pixel_size=750.0, source_valid=valid)
    assert rs.x_size >= 1 and rs.y_size >= 1
    assert np.isfinite(rs.cell_x) and rs.cell_x > 0
    assert np.isfinite(rs.cell_y) and rs.cell_y > 0
    img = np.full(lat.shape, 7.0, np.float32)
    out = np.asarray(rs.resample_image(img, fill_value=np.nan))
    assert out.shape == (rs.y_size, rs.x_size)
    # the one valid pixel resolves to the one covering cell
    assert np.nanmax(out) == 7.0
    lon_g, lat_g = rs.lonlats()
    assert np.isfinite(lat_g).all() and np.isfinite(lon_g).all()

    # a handful of clustered valid pixels (sub-pixel extent in one axis
    # only) must also survive
    valid[16, 17] = True
    rs2 = UTMResampler(lat, lon, pixel_size=75000.0, source_valid=valid)
    assert rs2.x_size >= 1 and rs2.y_size >= 1
    out2 = np.asarray(rs2.resample_image(img, fill_value=np.nan))
    assert np.nanmax(out2) == 7.0
