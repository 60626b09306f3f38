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
