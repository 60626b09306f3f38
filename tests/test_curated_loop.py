"""Curation → training loop (VERDICT round-1 #2).

The reference's reason to exist: identify → human curation → labelled
training data (``plume_selector.py:229-233`` + ``filepaths.py:32``). These
tests cover the rasterisation inverse (hull → mask), the model-data builder,
and the full CLI chain make_dataset → build_features → select --decisions →
prepare_model_data → train_model --curated.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from plumekit.train.curated import (build_model_data, make_curated_dataset,
                                    rasterize_hulls)


def _hull_df_from_mask(mask: np.ndarray, pid: int = 0,
                       dt: str = "t0") -> pd.DataFrame:
    """Extract the convex-hull vertex rows the identify detectors write."""
    from plumekit.ops.geometry import convex_hull_vertices_host

    ys, xs = np.nonzero(mask)
    pts = np.column_stack([xs, ys]).astype(np.float64)
    verts = convex_hull_vertices_host(pts)
    return pd.DataFrame({
        "id": pid, "datetime": dt,
        "hull_x": pts[verts, 0], "hull_y": pts[verts, 1],
        "hull_lats": 0.0, "hull_lons": 0.0,
    })


def test_rasterize_round_trip_convex_mask():
    """mask → hull → rasterize recovers a convex mask exactly."""
    mask = np.zeros((64, 64), bool)
    yy, xx = np.mgrid[0:64, 0:64]
    mask[((yy - 30) / 12.0) ** 2 + ((xx - 28) / 5.0) ** 2 <= 1.0] = True
    df = _hull_df_from_mask(mask)
    back = rasterize_hulls(df, mask.shape)
    # convex fill of a convex region == the region (boundary-inclusive)
    inter = (back & mask).sum()
    union = (back | mask).sum()
    assert inter / union > 0.97
    assert back[mask].mean() == 1.0  # no original pixel lost


def test_rasterize_multiple_ids_union_and_degenerate():
    m1 = np.zeros((48, 48), bool)
    m1[5:15, 5:20] = True
    m2 = np.zeros((48, 48), bool)
    m2[30:40, 25:45] = True
    df = pd.concat([_hull_df_from_mask(m1, 0), _hull_df_from_mask(m2, 1)],
                   ignore_index=True)
    # degenerate: collinear 3-vertex hull must be skipped, not crash
    degen = pd.DataFrame({
        "id": 2, "datetime": "t0",
        "hull_x": [1.0, 2.0, 3.0], "hull_y": [1.0, 2.0, 3.0],
        "hull_lats": 0.0, "hull_lons": 0.0,
    })
    out = rasterize_hulls(pd.concat([df, degen], ignore_index=True), (48, 48))
    assert out[m1].all() and out[m2].all()
    assert not out[0:3, 40:43].any()


def test_build_model_data_and_dataset(tmp_path):
    """Synthetic hulls + granule on disk → model-ready npz → GranuleSample."""
    from plumekit.config import PathsConfig
    from plumekit.io.granule import Granule, save_granule
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    scene = make_scene(SyntheticSceneConfig(size=96, n_plumes=2, seed=1))
    save_granule(os.path.join(paths.ensure("maiac_dir"), "g0.npz"),
                 scene.granule)
    scene.fires.drop(columns=["date_time"]).to_csv(
        os.path.join(paths.ensure("fires_dir"), "fires.csv"), index=False)

    mask = np.zeros((96, 96), bool)
    mask[20:40, 10:30] = True
    df = _hull_df_from_mask(mask, 0, dt=next(iter(scene.granule.layers)))
    df.to_csv(os.path.join(paths.ensure("reduced_plume_hull_dir"),
                           "g0_extent.csv"), index=False)

    written = build_model_data(paths)
    assert len(written) == 1
    samples = make_curated_dataset(paths.resolve("model_data_dir"))
    assert len(samples) == 1
    s = samples[0]
    assert s.channels.shape == (96, 96, 2)
    assert s.mask.shape == (96, 96)
    assert s.mask[25, 15] == 1.0 and s.mask[90, 90] == 0.0
    # fire channel populated from the CSV
    assert s.channels[..., 1].max() == 1.0

    with pytest.raises(FileNotFoundError):
        make_curated_dataset(str(tmp_path / "empty_dir_nope"))


def test_build_model_data_uncurated(tmp_path):
    """--uncurated builds samples from the FULL identify output
    (hull_df_dir) — the raw-weak-label path when nothing was curated —
    preferring device masks, and skipping hull-less (basic detector)
    extent CSVs instead of crashing."""
    from plumekit.config import PathsConfig
    from plumekit.io.granule import save_granule
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    scene = make_scene(SyntheticSceneConfig(size=96, n_plumes=2, seed=2))
    ts = next(iter(scene.granule.layers))
    save_granule(os.path.join(paths.ensure("maiac_dir"), "g0.npz"),
                 scene.granule)

    mask = np.zeros((96, 96), bool)
    mask[20:40, 10:30] = True
    df = _hull_df_from_mask(mask, 0, dt=ts)
    df.to_csv(os.path.join(paths.ensure("hull_df_dir"), "g0_extent.csv"),
              index=False)
    # device mask npz keyed by the hull id: sharper than the convex fill
    dev = np.zeros((96, 96), bool)
    dev[22:38, 12:28] = True
    np.savez_compressed(os.path.join(paths.ensure("plume_mask_dir"),
                                     "g0_masks.npz"), **{"0": dev})
    # a basic-detector bbox-only CSV in the same tree must be skipped
    pd.DataFrame({"plume_id": [1], "min_r": [0], "min_c": [0],
                  "max_r": [5], "max_c": [5]}).to_csv(
        os.path.join(paths.resolve("hull_df_dir"), "gb_extent.csv"),
        index=False)

    # nothing curated: the default (reduced) path finds nothing...
    assert build_model_data(paths) == []
    # ...the uncurated path builds from the full identify output
    written = build_model_data(paths, uncurated=True)
    assert len(written) == 1
    with np.load(written[0]) as z:
        np.testing.assert_array_equal(z["mask"].astype(bool), dev)


def test_prepare_model_data_uncurated_cli(tmp_path):
    from plumekit.cli import main
    from plumekit.config import PathsConfig
    from plumekit.io.granule import save_granule
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    scene = make_scene(SyntheticSceneConfig(size=96, n_plumes=1, seed=3))
    save_granule(os.path.join(paths.ensure("maiac_dir"), "g0.npz"),
                 scene.granule)
    mask = np.zeros((96, 96), bool)
    mask[10:30, 40:60] = True
    _hull_df_from_mask(mask, 0, dt=next(iter(scene.granule.layers))).to_csv(
        os.path.join(paths.ensure("hull_df_dir"), "g0_extent.csv"),
        index=False)
    assert main(["prepare_model_data", "--root", root, "--uncurated"]) == 0
    outs = os.listdir(paths.resolve("model_data_dir"))
    assert len(outs) == 1


@pytest.mark.skipif(os.environ.get("PLUMEKIT_RUN_SLOW") != "1",
                    reason="slow E2E (identify compile); PLUMEKIT_RUN_SLOW=1")
def test_cli_full_curated_loop(tmp_path):
    """make_dataset → build_features → select --decisions →
    prepare_model_data → train_model --curated, all through the CLI."""
    from plumekit.cli import main as cli_main
    from plumekit.config import PathsConfig

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    assert cli_main(["make_dataset", "--root", root, "--n-granules", "2",
                     "--size", "128", "--plumes", "2"]) == 0
    assert cli_main(["build_features", "--root", root,
                     "--detector", "rg"]) == 0
    # keep everything the auto-reject lets through
    dec_rows = []
    hull_dir = paths.resolve("hull_df_dir")
    for f in sorted(os.listdir(hull_dir)):
        df = pd.read_csv(os.path.join(hull_dir, f))
        if not len(df):
            continue
        for pid in df.id.unique():
            dec_rows.append({"id": int(pid), "datetime": "layer0",
                             "keep": 1})
    dec = tmp_path / "decisions.csv"
    pd.DataFrame(dec_rows).to_csv(dec, index=False)
    assert cli_main(["select", "--root", root, "--decisions",
                     str(dec)]) == 0
    assert cli_main(["prepare_model_data", "--root", root]) == 0
    assert cli_main(["train_model", "--root", root, "--curated",
                     "--steps", "2", "--batch-size", "2",
                     "--tile", "64"]) == 0


def test_plume_masks_ids_match_hull_ids():
    """plume_masks must key by EXACTLY the ids build_scene_dataframes
    assigns (they share one id-assignment walk) — a drift here would pair
    curated decisions with the wrong plume's pixels."""
    from plumekit.config.identify import RGIdentifyConfig
    from plumekit.identify import rg as rg_mod
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    scene = make_scene(SyntheticSceneConfig(size=160, n_plumes=2, seed=11))
    g = scene.granule
    _aod_df, hull_df, out = rg_mod.identify(
        g.first_layer(), g.lat, g.lon, scene.fires.date_time.iloc[0],
        scene.fires, RGIdentifyConfig(max_fires=8))
    masks = rg_mod.plume_masks(out)
    assert set(masks) >= set(int(i) for i in hull_df.id.unique())
    for pid in hull_df.id.unique():
        m = masks[int(pid)]
        hy = hull_df[hull_df.id == pid].hull_y.to_numpy(int)
        hx = hull_df[hull_df.id == pid].hull_x.to_numpy(int)
        assert m[hy, hx].all()  # hull vertices lie on the mask


def test_build_model_data_prefers_device_masks(tmp_path):
    """With a plume_mask npz present, the curated training target is the
    device mask (non-convex preserved), not its convex fill; --hulls-only
    restores the reference artifact."""
    from plumekit.config import PathsConfig
    from plumekit.io.granule import save_granule
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    scene = make_scene(SyntheticSceneConfig(size=96, n_plumes=2, seed=1))
    save_granule(os.path.join(paths.ensure("maiac_dir"), "g0.npz"),
                 scene.granule)

    # L-shaped (non-convex) device mask: its convex fill covers the notch
    dev = np.zeros((96, 96), bool)
    dev[20:40, 10:16] = True
    dev[34:40, 10:30] = True
    df = _hull_df_from_mask(dev, 0, dt=next(iter(scene.granule.layers)))
    df.to_csv(os.path.join(paths.ensure("reduced_plume_hull_dir"),
                           "g0_extent.csv"), index=False)
    np.savez_compressed(os.path.join(paths.ensure("plume_mask_dir"),
                                     "g0_masks.npz"), **{"0": dev})

    written = build_model_data(paths)
    got = np.load(written[0])["mask"].astype(bool)
    np.testing.assert_array_equal(got, dev)        # notch NOT filled

    hull_written = build_model_data(paths, use_masks=False)
    hull_mask = np.load(hull_written[0])["mask"].astype(bool)
    assert hull_mask[dev].all() and hull_mask.sum() > dev.sum()  # convex fill

    # kept id missing from the npz -> clean fallback to hulls
    np.savez_compressed(os.path.join(paths.resolve("plume_mask_dir"),
                                     "g0_masks.npz"), **{"7": dev})
    fb = np.load(build_model_data(paths)[0])["mask"].astype(bool)
    np.testing.assert_array_equal(fb, hull_mask)


def test_cli_build_features_writes_mask_npz(tmp_path):
    """build_features (rg) persists per-plume device masks keyed by hull
    ids; --no-masks suppresses them (reference-parity artifacts only)."""
    from plumekit.cli import main as cli_main
    from plumekit.config import PathsConfig

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    assert cli_main(["make_dataset", "--root", root, "--n-granules", "1",
                     "--size", "160", "--plumes", "2"]) == 0
    assert cli_main(["build_features", "--root", root,
                     "--detector", "rg"]) == 0
    mask_dir = paths.resolve("plume_mask_dir")
    npzs = [f for f in os.listdir(mask_dir) if f.endswith("_masks.npz")]
    hull_dir = paths.resolve("hull_df_dir")
    hulls = [f for f in os.listdir(hull_dir) if f.endswith("_extent.csv")]
    assert hulls
    df = pd.read_csv(os.path.join(hull_dir, hulls[0]))
    if len(df):
        assert npzs, "device masks missing despite accepted plumes"
        with np.load(os.path.join(mask_dir, npzs[0])) as data:
            assert set(data.files) >= set(
                str(int(i)) for i in df.id.unique())
