"""Model-guided curation ordering (plumekit.label.ranking + --rank wiring).

The ranking claim itself (false plumes concentrate at the queue head) is
measured in experiments/active_curation.py; these tests pin the
mechanics: scores over masks vs hull fallback, NaN-first ordering,
manifest ordering + column, and the select CLI join against saved
predictions.
"""

import os

import numpy as np
import pandas as pd
import pytest

from plumekit.io.granule import Granule
from plumekit.label import (apply_decisions, export_review_batch,
                            order_reviews, plume_support, review_order,
                            review_plumes)
from plumekit.label.ranking import SUPPORT_COL


def _square_hull(cy, cx, r, pid, dt="t0"):
    ys = [cy - r, cy - r, cy + r, cy + r]
    xs = [cx - r, cx + r, cx + r, cx - r]
    return pd.DataFrame(
        {"id": float(pid), "hull_lats": [float(cy)] * 4,
         "hull_lons": [float(cx)] * 4, "hull_x": xs, "hull_y": ys,
         "datetime": dt})


@pytest.fixture()
def toy_granule():
    aod = np.full((128, 128), 0.05, np.float32)
    aod[40:60, 40:60] = 0.8
    aod[90:110, 20:40] = 0.7
    lat, lon = np.mgrid[0:128, 0:128].astype(np.float64)
    return Granule(layers={"t0": aod}, lat=lat, lon=lon, name="toy")


@pytest.fixture()
def probs():
    p = np.zeros((128, 128), np.float32)
    p[40:60, 40:60] = 0.9      # plume 0: model believes it
    p[90:110, 20:40] = 0.1     # plume 1: model disbelieves it
    return p


def test_plume_support_hull_fallback(probs):
    df = pd.concat([_square_hull(50, 50, 9, 0), _square_hull(100, 30, 9, 1)],
                   ignore_index=True)
    scores = plume_support(probs, df)
    s = scores.set_index("id")[SUPPORT_COL]
    assert s[0] > 0.8 and s[1] < 0.2
    assert (scores.n_pixels > 300).all()


def test_plume_support_prefers_masks(probs):
    df = _square_hull(50, 50, 9, 0)
    # device mask disjoint from the hull, sitting on low-prob pixels:
    # if masks are honored the support must be the mask's, not the hull's
    m = np.zeros((128, 128), bool)
    m[90:110, 20:40] = True
    scores = plume_support(probs, df, masks={"0": m})
    assert scores[SUPPORT_COL].iloc[0] < 0.2
    # id missing from the mapping falls back to the hull
    scores = plume_support(probs, df, masks={"7": m})
    assert scores[SUPPORT_COL].iloc[0] > 0.8


def test_plume_support_degenerate_hull_is_nan(probs):
    df = _square_hull(50, 50, 0, 3)          # zero-radius: collinear hull
    scores = plume_support(probs, df)
    assert np.isnan(scores[SUPPORT_COL].iloc[0])
    assert scores.n_pixels.iloc[0] == 0


def test_review_order_nan_first_then_ascending():
    scores = pd.DataFrame({
        "id": [0, 1, 2, 3], "datetime": ["t0"] * 4,
        SUPPORT_COL: [0.9, 0.1, np.nan, 0.5], "n_pixels": [9, 9, 0, 9]})
    assert review_order(scores) == [(2, "t0"), (1, "t0"), (3, "t0"),
                                    (0, "t0")]


def test_order_reviews_and_export_manifest(tmp_path, toy_granule, probs):
    df = pd.concat([_square_hull(50, 50, 9, 0), _square_hull(100, 30, 9, 1)],
                   ignore_index=True)
    scores = plume_support(probs, df)
    reviews = review_plumes(df, toy_granule)
    assert [r.plume_id for r in order_reviews(reviews, scores)] == [1, 0]
    assert [r.plume_id for r in order_reviews(reviews, None)] == [0, 1]

    manifest = export_review_batch(df, toy_granule, str(tmp_path),
                                   scores=scores)
    assert list(manifest.id) == [1, 0]                 # suspect first
    assert manifest[SUPPORT_COL].iloc[0] < 0.2
    assert manifest[SUPPORT_COL].iloc[1] > 0.8
    # without scores the column is absent and order is file order
    manifest = export_review_batch(df, toy_granule, str(tmp_path))
    assert SUPPORT_COL not in manifest.columns
    assert list(manifest.id) == [0, 1]


def test_apply_decisions_sees_ranked_order(toy_granule, probs):
    df = pd.concat([_square_hull(50, 50, 9, 0), _square_hull(100, 30, 9, 1)],
                   ignore_index=True)
    seen = []

    def decide(r):
        seen.append(r.plume_id)
        return True

    kept, _ = apply_decisions(df, toy_granule, decide,
                              scores=plume_support(probs, df))
    assert seen == [1, 0]
    assert set(kept.id.unique()) == {0.0, 1.0}


def test_cli_select_ranked(tmp_path, toy_granule, probs):
    """select --rank-with-predictions joins saved predictions + device
    masks and writes the ranked manifest; granules without predictions
    fall back to file order with a warning, not a failure."""
    from plumekit.cli import main
    from plumekit.config.paths import PathsConfig
    from plumekit.io.granule import save_granule

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    save_granule(os.path.join(paths.ensure("maiac_dir"), "toy.npz"),
                 toy_granule)
    df = pd.concat([_square_hull(50, 50, 9, 0), _square_hull(100, 30, 9, 1)],
                   ignore_index=True)
    df.to_csv(os.path.join(paths.ensure("hull_df_dir"), "toy_extent.csv"),
              index=False)
    np.savez_compressed(
        os.path.join(paths.ensure("predictions_dir"), "toy_pred.npz"),
        probs=probs)
    # device mask for plume 1 only; plume 0 scores via hull fallback
    m = np.zeros((128, 128), bool)
    m[90:110, 20:40] = True
    np.savez_compressed(
        os.path.join(paths.ensure("plume_mask_dir"), "toy_masks.npz"),
        **{"1": m})

    assert main(["select", "--root", root, "--rank-with-predictions"]) == 0
    manifest = pd.read_csv(tmp_path / "review/toy/manifest.csv")
    assert list(manifest.id) == [1, 0]
    assert manifest[SUPPORT_COL].iloc[0] < 0.2

    # no prediction for this granule: unranked manifest, exit 0
    os.remove(os.path.join(paths.resolve("predictions_dir"),
                           "toy_pred.npz"))
    assert main(["select", "--root", root, "--rank-with-predictions"]) == 0
    manifest = pd.read_csv(tmp_path / "review/toy/manifest.csv")
    assert SUPPORT_COL not in manifest.columns


def test_ranking_with_numeric_datetime_column(tmp_path, toy_granule, probs):
    """A hull CSV whose datetime column parses numeric must still rank
    (keys are str-normalised on both sides of every join)."""
    df = pd.concat([_square_hull(50, 50, 9, 0, dt=0),
                    _square_hull(100, 30, 9, 1, dt=0)], ignore_index=True)
    granule = Granule(layers={"0": toy_granule.layers["t0"]},
                      lat=toy_granule.lat, lon=toy_granule.lon, name="toy")
    scores = plume_support(probs, df)
    assert scores.datetime.map(type).eq(str).all()
    manifest = export_review_batch(df, granule, str(tmp_path),
                                   scores=scores)
    assert list(manifest.id) == [1, 0]
    assert manifest[SUPPORT_COL].notna().all()


def test_plume_support_stale_shape_falls_back_to_hull(probs):
    df = _square_hull(50, 50, 9, 0)
    stale = np.zeros((64, 64), bool)   # wrong-resolution device mask
    stale[10:20, 10:20] = True
    scores = plume_support(probs, df, masks={"0": stale})
    assert scores[SUPPORT_COL].iloc[0] > 0.8   # hull, not the stale mask
