"""Selector (curation) and CLI tests."""

import os

import numpy as np
import pandas as pd
import pytest

from plumekit.io.granule import Granule
from plumekit.label import (
    apply_decisions,
    auto_reject,
    export_review_batch,
    find_plume_aod,
    remove_duplicated_plumes,
    review_plumes,
    subset_plume,
)


def _square_hull(cy, cx, r, pid, dt="t0"):
    ys = [cy - r, cy - r, cy + r, cy + r]
    xs = [cx - r, cx + r, cx + r, cx - r]
    return pd.DataFrame(
        {"id": float(pid), "hull_lats": [float(cy)] * 4,
         "hull_lons": [float(cx)] * 4, "hull_x": xs, "hull_y": ys,
         "datetime": dt}
    )


@pytest.fixture()
def toy_granule():
    aod = np.full((128, 128), 0.05, np.float32)
    aod[40:60, 40:60] = 0.8  # bright plume
    lat, lon = np.mgrid[0:128, 0:128].astype(np.float64)
    return Granule(layers={"t0": aod}, lat=lat, lon=lon, name="toy")


def test_remove_duplicated_plumes():
    a = _square_hull(50, 50, 5, 0)
    b = _square_hull(50, 50, 5, 1)      # same centroid -> duplicate
    c = _square_hull(90, 90, 5, 2)
    df = pd.concat([a, b, c], ignore_index=True)
    out = remove_duplicated_plumes(df)
    assert set(out.id.unique()) == {0.0, 2.0}


def test_subset_plume_and_in_hull(toy_granule):
    df = _square_hull(50, 50, 10, 0)
    crop, hx, hy = subset_plume(toy_granule.layers["t0"], df)
    assert crop is not None
    vals = find_plume_aod(crop, hx, hy)
    assert vals.size > 300
    assert (vals > 0.5).mean() > 0.9  # bright region captured
    assert not auto_reject(vals)


def test_auto_reject_zero_bin(toy_granule):
    df = _square_hull(100, 20, 8, 0)  # background region, AOD ~0.05
    crop, hx, hy = subset_plume(toy_granule.layers["t0"], df)
    vals = find_plume_aod(crop, hx, hy)
    # modal bin is the lowest (0-0.02)? 0.05 falls in bin 2 -> not rejected
    assert not auto_reject(vals)
    assert auto_reject(np.zeros(100, np.float32))
    assert auto_reject(np.zeros(0, np.float32))


def test_apply_decisions(toy_granule):
    plume = _square_hull(50, 50, 10, 0)
    bg = _square_hull(100, 20, 8, 1)
    df = pd.concat([plume, bg], ignore_index=True)
    kept, rejected = apply_decisions(df, toy_granule,
                                     lambda r: r.plume_id == 0)
    assert set(kept.id.unique()) == {0.0}
    assert set(rejected.id.unique()) == {1.0}


def test_interactive_review_headless(toy_granule, monkeypatch):
    """Drive the blocking key loop without a GUI (VERDICT round-4 #7):
    plt.show is replaced by a synthetic key_press_event dispatch through
    the real mpl_connect callback registry, so the '1'-keeps / '0'-rejects
    / close-without-answer-rejects semantics (reference
    plume_selector.py:118-134) are exercised end-to-end on Agg."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backend_bases import KeyEvent

    from plumekit.label.selector import interactive_review

    # per-plume scripts: irrelevant keys must be ignored, None = the user
    # closed the window without deciding (defaults to reject)
    scripts = iter([["x", "1"], ["0"], [None]])

    def fake_show(*args, **kwargs):
        fig = plt.gcf()
        for key in next(scripts):
            if key is None:
                plt.close(fig)
                return
            fig.canvas.callbacks.process(
                "key_press_event",
                KeyEvent("key_press_event", fig.canvas, key))
            if not plt.fignum_exists(fig.number):
                return  # the handler closed the figure: decision made

    monkeypatch.setattr(plt, "show", fake_show)
    df = pd.concat([_square_hull(50, 50, 10, 0),
                    _square_hull(100, 20, 8, 1),
                    _square_hull(20, 100, 8, 2)], ignore_index=True)
    kept, rejected = interactive_review(df, toy_granule)
    assert set(kept.id.unique()) == {0.0}
    assert set(rejected.id.unique()) == {1.0, 2.0}
    assert not plt.get_fignums()  # every review figure was closed


def test_export_review_batch(tmp_path, toy_granule):
    df = _square_hull(50, 50, 10, 0)
    manifest = export_review_batch(df, toy_granule, str(tmp_path))
    assert (tmp_path / "manifest.csv").exists()
    assert len(manifest) == 1
    assert (tmp_path / manifest.png.iloc[0]).exists()


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_parser_all_commands():
    from plumekit.cli import build_parser

    p = build_parser()
    for argv in (
        ["make_dataset", "--n-granules", "1"],
        ["build_features", "--detector", "gaussian"],
        ["train_model", "--steps", "5"],
        ["predict_model"],
        ["identify", "g.npz", "f.csv"],
        ["select", "--decisions", "d.csv"],
    ):
        args = p.parse_args(argv)
        assert callable(args.fn)


def test_cli_make_dataset(tmp_path):
    from plumekit.cli import main

    rc = main(["make_dataset", "--root", str(tmp_path), "--n-granules", "1",
               "--size", "128", "--plumes", "2"])
    assert rc == 0
    maiac = tmp_path / "raw/plume_identification/maiac"
    files = list(maiac.glob("*.npz"))
    assert len(files) == 1
    fires = pd.read_csv(tmp_path / "raw/fires/fires.csv")
    assert {"latitude", "longitude", "frp", "acq_date"} <= set(fires.columns)


@pytest.mark.skipif(
    not os.environ.get("PLUMEKIT_RUN_SLOW"),
    reason="full CLI pipeline is compile-heavy; set PLUMEKIT_RUN_SLOW=1",
)
def test_cli_full_pipeline(tmp_path):
    from plumekit.cli import main

    root = str(tmp_path)
    assert main(["make_dataset", "--root", root, "--n-granules", "1",
                 "--size", "256", "--plumes", "3"]) == 0
    assert main(["build_features", "--root", root, "--detector", "rg"]) == 0
    hull_dir = tmp_path / "raw/plume_identification/dataframes/full/hull"
    assert list(hull_dir.glob("*_extent.csv"))
    assert main(["train_model", "--root", root, "--steps", "3",
                 "--batch-size", "2", "--tile", "64",
                 "--granule-size", "128"]) == 0
    assert main(["predict_model", "--root", root, "--tile", "64"]) == 0
    preds = list((tmp_path / "processed/predictions").glob("*_pred.npz"))
    assert preds
    # the post-model half of the chain: weak labels straight to model-ready
    # samples (no curation), score the saved predictions, summarise
    assert main(["prepare_model_data", "--root", root, "--uncurated"]) == 0
    assert main(["evaluate_model", "--root", root,
                 "--predictions", str(tmp_path / "processed/predictions"),
                 ]) == 0
    assert (tmp_path / "processed/evaluation.csv").exists()
    assert main(["report", "--root", root]) == 0
    text = (tmp_path / "reports/report.md").read_text()
    for section in ("## Identify", "## Model-ready data", "## Training",
                    "## Predictions", "## Evaluation"):
        assert section in text, section


def test_subset_plume_matches_reference_branch_semantics():
    """Quirk #12 oracle: the vectorised crop must equal the reference's
    four-branch clamp (plume_selector.py:53-85) in every clamp combination —
    including the asymmetric buffer margin when the hull sits near an edge."""
    from plumekit.label.selector import BUFFER_PX

    def oracle(aod, hull_x, hull_y):
        min_x, max_x = hull_x.min(), hull_x.max()
        min_y, max_y = hull_y.min(), hull_y.max()
        hull_x, hull_y = hull_x.copy(), hull_y.copy()
        if min_x - BUFFER_PX < 0:
            min_x = 0
        else:
            hull_x = hull_x - min_x + BUFFER_PX
            min_x = min_x - BUFFER_PX
        if min_y - BUFFER_PX < 0:
            min_y = 0
        else:
            hull_y = hull_y - min_y + BUFFER_PX
            min_y = min_y - BUFFER_PX
        max_x = aod.shape[1] if max_x + BUFFER_PX > aod.shape[1] else max_x + BUFFER_PX
        max_y = aod.shape[0] if max_y + BUFFER_PX > aod.shape[0] else max_y + BUFFER_PX
        return (aod[int(min_y):int(max_y), int(min_x):int(max_x)],
                hull_x, hull_y)

    rng = np.random.default_rng(0)
    aod = rng.random((128, 128)).astype(np.float32)
    cases = [  # (cx, cy): interior, near each edge, near corner
        (64, 64), (10, 64), (64, 10), (120, 64), (64, 120), (8, 8),
        (122, 122),
    ]
    for cx, cy in cases:
        df = _square_hull(cx, cy, 6, 0)
        got_crop, got_x, got_y = subset_plume(aod, df)
        exp_crop, exp_x, exp_y = oracle(
            aod, df.hull_x.to_numpy(float), df.hull_y.to_numpy(float))
        np.testing.assert_array_equal(got_crop, exp_crop), (cx, cy)
        np.testing.assert_allclose(got_x, exp_x)
        np.testing.assert_allclose(got_y, exp_y)

    # nan hull bails out like the reference's isnan check
    df = _square_hull(64, 64, 6, 0)
    df.loc[0, "hull_x"] = np.nan
    assert subset_plume(aod, df) == (None, None, None)
