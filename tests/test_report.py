"""Campaign report generator: section rendering from real workspace
artifacts, graceful behavior on empty/partial roots, CLI wiring."""

import os

import numpy as np
import pandas as pd
import pytest

from plumekit.viz.report import build_report


def test_report_empty_root(tmp_path):
    out = build_report(str(tmp_path))
    assert os.path.exists(out)
    text = open(out).read()
    assert "empty workspace" in text


def _make_workspace(root):
    """Minimal artifacts for every report section without running the
    pipeline (each file matches the real producers' schemas)."""
    from plumekit.config import PathsConfig

    paths = PathsConfig(root=root)
    # data
    gd = paths.ensure("maiac_dir")
    np.savez_compressed(os.path.join(gd, "granA.npz"),
                        **{"layer_layer0": np.zeros((8, 8), np.float32),
                           "lat": np.zeros((8, 8)), "lon": np.zeros((8, 8))})
    fd = paths.ensure("fires_dir")
    pd.DataFrame({"latitude": [0.0], "longitude": [0.0],
                  "date_time": ["2016-05-02"]}).to_csv(
        os.path.join(fd, "fires.csv"), index=False)
    # identify hulls (rg schema)
    hd = paths.ensure("hull_df_dir")
    pd.DataFrame({"id": [1, 1, 2], "datetime": ["layer0"] * 3,
                  "hull_x": [1.0, 2.0, 3.0], "hull_y": [1.0, 2.0, 3.0]}
                 ).to_csv(os.path.join(hd, "granA_extent.csv"), index=False)
    # curation
    kd = paths.ensure("reduced_plume_hull_dir")
    pd.DataFrame({"id": [1], "datetime": ["layer0"],
                  "hull_x": [1.0], "hull_y": [1.0]}).to_csv(
        os.path.join(kd, "granA_extent.csv"), index=False)
    rd = paths.ensure("reduced_not_plume_hull_dir")
    pd.DataFrame({"id": [2], "datetime": ["layer0"],
                  "hull_x": [3.0], "hull_y": [3.0]}).to_csv(
        os.path.join(rd, "granA_extent.csv"), index=False)
    # model data
    md = paths.ensure("model_data_dir")
    mask = np.zeros((16, 16), np.float32)
    mask[:4, :4] = 1.0
    np.savez_compressed(os.path.join(md, "granA__layer0.npz"),
                        channels=np.zeros((16, 16, 2), np.float32),
                        mask=mask)
    # training metrics (MetricsWriter schema)
    ck = os.path.join(root, paths.model_dir, "checkpoints")
    os.makedirs(ck)
    os.makedirs(os.path.join(ck, "step_00000020"))
    pd.DataFrame({"step": [10, 20], "loss": [0.8, 0.5],
                  "iou": [0.2, 0.4], "mpix_s": [1.0, 1.1]}).to_csv(
        ck + "_metrics.csv", index=False)
    # predictions + evaluation
    pdir = os.path.join(root, "processed", "predictions")
    os.makedirs(pdir)
    np.savez_compressed(os.path.join(pdir, "granA_pred.npz"),
                        probs=mask, mask=mask > 0.5)
    pd.DataFrame([{"name": "granA__layer0", "plume_px": 16, "iou": 0.9,
                   "dice": 0.95, "precision": 0.9, "recall": 1.0,
                   "accuracy": 0.99},
                  {"name": "micro", "plume_px": 16, "iou": 0.9,
                   "dice": 0.95, "precision": 0.9, "recall": 1.0,
                   "accuracy": 0.99},
                  {"name": "macro", "plume_px": 16, "iou": 0.9,
                   "dice": 0.95, "precision": 0.9, "recall": 1.0,
                   "accuracy": 0.99}]).to_csv(
        os.path.join(root, "processed", "evaluation.csv"), index=False)


def test_report_full_workspace(tmp_path):
    root = str(tmp_path)
    _make_workspace(root)
    out = build_report(root)
    text = open(out).read()
    assert "granules: **1**" in text
    assert "2 plumes" in text                    # identify section
    assert "kept **1** / rejected 1" in text     # curation
    assert "samples: **1**" in text              # model data
    assert "step **20**" in text                 # training checkpoint
    assert "| iou | 0.9000 |" in text            # evaluation table
    assert "95% CI" not in text                  # legacy table: no counts
    assert os.path.exists(os.path.join(root, "reports", "figures",
                                       "training.png"))


def test_report_evaluation_ci_column(tmp_path):
    """A report whose evaluation table carries the per-sample count
    columns renders the scene-level bootstrap CI alongside each metric."""
    import pandas as pd

    root = str(tmp_path)
    _make_workspace(root)
    rows = []
    for i, (tp, fp, fn) in enumerate([(80, 10, 10), (40, 30, 30),
                                      (60, 20, 20)]):
        rows.append({"name": f"g{i}", "plume_px": tp + fn,
                     "iou": tp / (tp + fp + fn), "dice": 0.9,
                     "precision": 0.9, "recall": 0.9, "accuracy": 0.99,
                     "tp": tp, "fp": fp, "fn": fn, "tn": 900})
    rows += [{**rows[0], "name": "micro"}, {**rows[0], "name": "macro"}]
    pd.DataFrame(rows).to_csv(
        os.path.join(root, "processed", "evaluation.csv"), index=False)
    text = open(build_report(root)).read()
    assert "95% CI" in text
    assert "scene-level bootstrap" in text


def test_report_partial_workspace_no_training(tmp_path):
    """Only raw data + hulls: the report renders those sections and omits
    training/eval without crashing."""
    from plumekit.config import PathsConfig

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    gd = paths.ensure("maiac_dir")
    np.savez_compressed(os.path.join(gd, "g.npz"),
                        layer_layer0=np.zeros((4, 4), np.float32),
                        lat=np.zeros((4, 4)), lon=np.zeros((4, 4)))
    out = build_report(root)
    text = open(out).read()
    assert "granules: **1**" in text
    assert "## Training" not in text
    assert "## Evaluation" not in text


def test_report_cli(tmp_path, capsys):
    from plumekit.cli import main

    root = str(tmp_path)
    _make_workspace(root)
    rc = main(["report", "--root", root])
    assert rc == 0
    printed = capsys.readouterr().out.strip()
    assert printed.endswith("report.md") and os.path.exists(printed)


def test_report_objects_and_calibration_sections(tmp_path):
    import json

    import pandas as pd

    from plumekit.config.paths import PathsConfig
    from plumekit.viz.report import build_report

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    proc = os.path.dirname(paths.resolve("evaluation_csv"))
    os.makedirs(proc, exist_ok=True)
    pd.DataFrame([{"name": "g", "pred_plumes": 3, "true_plumes": 4,
                   "obj_precision": 1.0, "obj_recall": 0.75,
                   "obj_f1": 0.857},
                  {"name": "micro", "pred_plumes": 3, "true_plumes": 4,
                   "obj_precision": 1.0, "obj_recall": 0.75,
                   "obj_f1": 0.857}]).to_csv(
        os.path.join(proc, "evaluation_objects.csv"), index=False)
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    with open(os.path.join(root, "models", "threshold.json"), "w") as f:
        json.dump({"threshold": 0.7, "metric": "iou", "value": 0.77,
                   "measured_utc": "2026-08-20T00:00:00Z"}, f)
    text = open(build_report(root)).read()
    assert "## Plume-level detection" in text
    assert "F1 **0.857**" in text
    assert "## Serving calibration" in text
    assert "threshold **0.7**" in text
