"""Decision-threshold calibration (sweep_thresholds / best_threshold /
--write-threshold / calibrated serving resolution)."""

import json
import os
from argparse import Namespace

import numpy as np
import pandas as pd
import pytest

from plumekit.train.evaluate import best_threshold, sweep_thresholds


def _pairs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        true = rng.random((32, 32)) < 0.3
        # probs correlated with truth but miscalibrated: optimum is NOT 0.5
        probs = np.clip(true * 0.45 + rng.random((32, 32)) * 0.4, 0, 1)
        out.append((f"s{i}", probs.astype(np.float32), true))
    return out


def test_sweep_thresholds_curve_and_best():
    sweep = sweep_thresholds(_pairs())
    assert len(sweep) == 19
    assert {"threshold", "iou", "dice", "precision",
            "recall"} <= set(sweep.columns)
    # precision must be non-decreasing-ish and recall non-increasing with
    # threshold; pin the exact monotone property for recall (always true)
    rec = sweep.recall.to_numpy()
    assert (np.diff(rec) <= 1e-12).all()
    t, v = best_threshold(sweep, metric="iou")
    assert v == sweep.iou.max()
    # by construction the miscalibrated probs peak away from 0.5
    at_default = float(sweep.loc[(sweep.threshold - 0.5).abs().idxmin(),
                                 "iou"])
    assert v > at_default

    with pytest.raises(ValueError, match="metric"):
        best_threshold(sweep, metric="nope")
    with pytest.raises(ValueError, match="no thresholds"):
        sweep_thresholds(_pairs(), thresholds=np.array([]))
    with pytest.raises(ValueError, match="nothing to sweep"):
        sweep_thresholds([])


def test_best_threshold_tie_prefers_half():
    sweep = pd.DataFrame({"threshold": [0.2, 0.5, 0.8],
                          "iou": [0.7, 0.7, 0.7]})
    t, v = best_threshold(sweep)
    assert (t, v) == (0.5, 0.7)


def test_resolve_threshold(tmp_path):
    from plumekit.cli import THRESHOLD_BASENAME, _resolve_threshold, \
        _write_json_atomic

    root = str(tmp_path)
    args = Namespace(root=root, threshold=None)
    assert _resolve_threshold(args) == 0.5                 # no artifact
    path = os.path.join(root, "models", THRESHOLD_BASENAME)
    _write_json_atomic(path, {"threshold": 0.35, "metric": "iou",
                              "value": 0.8})
    assert _resolve_threshold(args) == 0.35                # calibrated
    assert _resolve_threshold(Namespace(root=root,
                                        threshold=0.6)) == 0.6  # explicit
    with open(path, "w") as f:
        f.write("not json")
    assert _resolve_threshold(args) == 0.5                 # torn → default


@pytest.mark.skipif(os.environ.get("PLUMEKIT_RUN_SLOW") != "1",
                    reason="slow E2E (identify compile); PLUMEKIT_RUN_SLOW=1")
def test_cli_sweep_and_calibrated_predict(tmp_path):
    """evaluate_model --sweep-threshold --write-threshold then
    predict_model serving the calibrated point end to end."""
    from plumekit.cli import THRESHOLD_BASENAME, main

    root = str(tmp_path)
    assert main(["make_dataset", "--root", root, "--n-granules", "2",
                 "--size", "128", "--plumes", "2"]) == 0
    assert main(["build_features", "--root", root, "--detector", "rg"]) == 0
    assert main(["prepare_model_data", "--root", root, "--uncurated"]) == 0
    assert main(["predict_model", "--root", root, "--tile", "64"]) == 0
    assert main(["evaluate_model", "--root", root,
                 "--predictions",
                 os.path.join(root, "processed/predictions"),
                 "--sweep-threshold", "--write-threshold"]) == 0
    tpath = tmp_path / "models" / THRESHOLD_BASENAME
    with open(tpath) as f:
        payload = json.load(f)
    assert 0.05 <= payload["threshold"] <= 0.95
    assert payload["metric"] == "iou"
    assert (tmp_path / "processed/threshold_sweep.csv").exists()

    # serving picks the calibrated threshold up automatically AND the
    # persisted mask is thresholded at it (regression: the mask used to
    # be hardcoded probs > 0.5 regardless of calibration)
    assert main(["predict_model", "--root", root, "--tile", "64"]) == 0
    pred = sorted((tmp_path / "processed/predictions").glob("*_pred.npz"))[0]
    with np.load(pred) as data:
        assert float(data["threshold"]) == payload["threshold"]
        np.testing.assert_array_equal(
            data["mask"], data["probs"] > payload["threshold"])
    # explicit flag overrides the artifact
    assert main(["predict_model", "--root", root, "--tile", "64",
                 "--threshold", "0.9"]) == 0
    with np.load(pred) as data:
        assert abs(float(data["threshold"]) - 0.9) < 1e-6


def test_sweep_matches_bruteforce_including_exact_ties():
    """The sorted-pass sweep must equal per-threshold brute force with
    STRICT > semantics, including probs exactly equal to a threshold."""
    from plumekit.train.evaluate import confusion_counts, \
        metrics_from_counts

    rng = np.random.default_rng(7)
    probs = rng.choice([0.05, 0.3, 0.5, 0.7, 0.95, 0.12, 0.88],
                       size=(40, 40)).astype(np.float32)
    true = rng.random((40, 40)) < 0.4
    ts = np.array([0.05, 0.3, 0.5, 0.7])
    sweep = sweep_thresholds([("s", probs, true)], thresholds=ts)
    for row, t in zip(sweep.itertuples(), ts):
        want = metrics_from_counts(confusion_counts(probs > t, true))
        for k, v in want.items():
            assert abs(getattr(row, k) - v) < 1e-12, (t, k)

    with pytest.raises(ValueError, match="strictly increasing"):
        sweep_thresholds([("s", probs, true)],
                         thresholds=np.array([0.5, 0.3]))
    with pytest.raises(ValueError, match="label shape"):
        sweep_thresholds([("s", probs, true[:10])])
