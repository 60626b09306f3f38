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
    # empties (two separate cases — an `or` across them tests neither)
    empty = np.zeros((32, 32), bool)
    assert tuple(object_counts(empty, true)) == (0, 0, 1)
    assert tuple(object_counts(empty, empty)) == (0, 0, 0)
    with pytest.raises(ValueError, match="match_iou"):
        object_counts(pred, true, match_iou=0.0)
    with pytest.raises(ValueError, match="label shape"):
        object_counts(pred[:8], true)


def test_object_counts_min_size_no_background():
    """Pruned-label counting must not assume label 0 survives: an
    all-True prediction (one giant component, no background pixel) used
    to be counted as ZERO components after min_size pruning, scoring
    obj_precision 1.0 for a garbage mask."""
    true = np.zeros((32, 32), bool)
    _blob(true, 4, 4, 8, 8)
    pred = np.ones((32, 32), bool)
    assert tuple(object_counts(pred, true, min_size=4)) == (0, 1, 1)


def test_object_counts_min_size_ignore_semantics():
    """min_size models the detector's accept gate with detection-style
    ignore regions: sub-floor TRUE plumes are neither missed (no fn)
    nor matchable, and a prediction sitting mostly on one is dropped
    rather than charged as a false positive."""
    true = np.zeros((32, 32), bool)
    _blob(true, 4, 4, 8, 8)        # 64 px — above the floor
    _blob(true, 24, 24, 2, 2)      # 4 px — below the floor (ignore)
    pred = np.zeros((32, 32), bool)
    _blob(pred, 4, 4, 8, 8)        # finds the big plume
    # missed ignored plume: not a false negative
    assert tuple(object_counts(pred, true, min_size=10)) == (1, 0, 0)
    # a large prediction mostly on the ignored plume: not a false
    # positive either (majority of its support is ignored)
    pred2 = pred.copy()
    _blob(pred2, 23, 23, 4, 4)     # 16 px >= floor? no: floor is 10,
    # 16 px survives pred pruning but sits 1:4 on the ignored plume —
    # only 4/16 px on ignore, so it IS charged as fp
    assert tuple(object_counts(pred2, true, min_size=10)) == (1, 1, 0)
    # a prediction whose MAJORITY lies on ignore: a 12-px pred with 8 px
    # on an 8-px ignored plume — dropped, not charged
    true2 = np.zeros((32, 32), bool)
    _blob(true2, 4, 4, 8, 8)
    _blob(true2, 24, 24, 2, 4)     # 8 px ignored plume
    pred4 = pred.copy()
    _blob(pred4, 24, 24, 3, 4)     # 12 px, 8 of them on the ignored plume
    assert tuple(object_counts(pred4, true2, min_size=10)) == (1, 0, 0)


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


def test_sweep_object_thresholds():
    """Plume-level sweep: a blob whose probabilities decay outward has a
    size-dependent optimum — high thresholds shrink it below match IoU."""
    from plumekit.train.evaluate import (best_threshold,
                                         sweep_object_thresholds)

    true = np.zeros((48, 48), bool)
    _blob(true, 10, 10, 20, 20)
    yy, xx = np.mgrid[0:48, 0:48]
    # radial decay centered on the plume: threshold 0.3 covers it,
    # threshold 0.8 keeps only a core far below 0.5 IoU
    d = np.hypot(yy - 20, xx - 20).astype(np.float32)
    probs = np.clip(0.9 - 0.035 * d, 0.0, 1.0)
    # measured geometry: 0.3 over-covers (IoU 0.43 < 0.5 → no match),
    # 0.6 matches (IoU 0.58), 0.85 keeps a 9-px core (IoU 0.02) — an
    # INTERIOR plume-level optimum neither pixel extreme sees
    sweep = sweep_object_thresholds([("s", probs, true)],
                                    thresholds=np.array([0.3, 0.6, 0.85]))
    f1 = sweep.obj_f1.to_numpy()
    assert f1[0] == 0.0 and f1[1] == 1.0 and f1[2] == 0.0
    t, v = best_threshold(sweep, metric="obj_f1")
    assert t == 0.6 and v == 1.0

    with pytest.raises(ValueError, match="nothing to sweep"):
        sweep_object_thresholds([])


def test_cli_sweep_object_metric(tmp_path):
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
    assert main(["evaluate_model", "--root", root,
                 "--predictions", paths.resolve("predictions_dir"),
                 "--sweep-threshold", "obj_f1"]) == 0
    assert (tmp_path / "processed/threshold_sweep.csv").exists()
    # unknown metric fails fast, before any inference
    assert main(["evaluate_model", "--root", root,
                 "--predictions", paths.resolve("predictions_dir"),
                 "--sweep-threshold", "f1"]) == 1
    # conflicting flags fail fast (the sweep used to silently swallow
    # --objects), as do out-of-range knobs — all before any inference
    assert main(["evaluate_model", "--root", root, "--objects",
                 "--predictions", paths.resolve("predictions_dir"),
                 "--sweep-threshold", "obj_f1"]) == 1
    assert main(["evaluate_model", "--root", root, "--objects",
                 "--predictions", paths.resolve("predictions_dir"),
                 "--match-iou", "0"]) == 1
    assert main(["evaluate_model", "--root", root, "--objects",
                 "--predictions", paths.resolve("predictions_dir"),
                 "--min-size", "0"]) == 1
    # --bootstrap is likewise swallowed by the sweep's early return —
    # the pair must fail fast too (ADVICE round 3)
    assert main(["evaluate_model", "--root", root, "--bootstrap", "10",
                 "--predictions", paths.resolve("predictions_dir"),
                 "--sweep-threshold", "obj_f1"]) == 1
