"""Plume-level detection metrics (evaluate.object_counts / --objects)."""

import json
import os

import numpy as np
import pytest

from plumekit.train.evaluate import (evaluate_objects, object_counts,
                                     object_metrics_from_counts)


def _blob(canvas, y, x, h, w):
    canvas[y:y + h, x:x + w] = True
    return canvas


def test_object_counts_exact_matching():
    true = np.zeros((64, 64), bool)
    _blob(true, 5, 5, 10, 10)       # plume A
    _blob(true, 40, 40, 8, 8)       # plume B
    pred = np.zeros((64, 64), bool)
    _blob(pred, 5, 5, 10, 10)       # A found exactly
    _blob(pred, 41, 41, 8, 8)       # B found shifted (IoU ~0.58 > 0.5)
    _blob(pred, 5, 50, 4, 4)        # invented plume
    tp, fp, fn = object_counts(pred, true)
    assert (tp, fp, fn) == (2, 1, 0)
    m = object_metrics_from_counts(np.array([tp, fp, fn]))
    assert m["obj_recall"] == 1.0
    assert abs(m["obj_precision"] - 2 / 3) < 1e-12

    # stricter match IoU: the shifted B no longer counts
    tp, fp, fn = object_counts(pred, true, match_iou=0.9)
    assert (tp, fp, fn) == (1, 2, 1)


def test_object_counts_one_to_one():
    """Two predicted fragments over ONE true plume: only one can match
    (the other is a false positive) — matching is one-to-one."""
    true = np.zeros((32, 32), bool)
    _blob(true, 4, 4, 6, 20)
    pred = np.zeros((32, 32), bool)
    _blob(pred, 4, 4, 6, 9)         # left fragment
    _blob(pred, 4, 15, 6, 9)        # right fragment (disjoint)
    tp, fp, fn = object_counts(pred, true, match_iou=0.3)
    assert (tp, fp, fn) == (1, 1, 0)


def test_object_counts_min_size_and_empty():
    true = np.zeros((32, 32), bool)
    _blob(true, 4, 4, 8, 8)
    pred = np.zeros((32, 32), bool)
    _blob(pred, 4, 4, 8, 8)
    pred[20, 20] = True             # 1-px speckle
    assert tuple(object_counts(pred, true)) == (1, 1, 0)
    assert tuple(object_counts(pred, true, min_size=4)) == (1, 0, 0)
    # empties
    assert tuple(object_counts(np.zeros((8, 8), bool), true[:8, :8])) \
        == (0, 0, 1) or tuple(
            object_counts(np.zeros((8, 8), bool),
                          np.zeros((8, 8), bool))) == (0, 0, 0)
    with pytest.raises(ValueError, match="match_iou"):
        object_counts(pred, true, match_iou=0.0)
    with pytest.raises(ValueError, match="label shape"):
        object_counts(pred[:8], true)


def test_evaluate_objects_table():
    true = np.zeros((32, 32), bool)
    _blob(true, 4, 4, 8, 8)
    probs = np.where(true, 0.9, 0.1).astype(np.float32)
    df = evaluate_objects([("a", probs, true), ("b", probs, true)])
    micro = df[df.name == "micro"].iloc[0]
    assert micro.obj_f1 == 1.0
    assert micro.true_plumes == 2 and micro.pred_plumes == 2
    with pytest.raises(ValueError, match="nothing to evaluate"):
        evaluate_objects([])


def test_cli_evaluate_objects(tmp_path):
    """--objects over saved predictions, end to end on tiny artifacts."""
    from plumekit.cli import main
    from plumekit.config.paths import PathsConfig

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    true = np.zeros((32, 32), np.float32)
    true[4:12, 4:12] = 1.0
    probs = np.where(true > 0, 0.9, 0.1).astype(np.float32)
    np.savez_compressed(os.path.join(paths.ensure("model_data_dir"),
                                     "g1__layer0.npz"),
                        channels=np.zeros((32, 32, 2), np.float32),
                        mask=true)
    np.savez_compressed(os.path.join(paths.ensure("predictions_dir"),
                                     "g1_pred.npz"), probs=probs)
    assert main(["evaluate_model", "--root", root, "--objects",
                 "--predictions", paths.resolve("predictions_dir")]) == 0
    csv = tmp_path / "processed/evaluation_objects.csv"
    assert csv.exists()
    import pandas as pd

    df = pd.read_csv(csv)
    assert df[df.name == "micro"].obj_f1.iloc[0] == 1.0
