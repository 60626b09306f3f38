"""evaluate_model surface: exact confusion counting, degenerate-denominator
conventions, inference + predictions modes, and the CLI e2e."""

import json
import os

import numpy as np
import pytest

from plumekit.train.evaluate import (
    confusion_counts,
    evaluate_model_data,
    evaluate_predictions,
    metrics_from_counts,
    write_report,
)


def test_confusion_counts_exact():
    pred = np.array([[1, 1, 0], [0, 1, 0]], bool)
    true = np.array([[1, 0, 0], [1, 1, 0]], bool)
    tp, fp, fn, tn = confusion_counts(pred, true)
    assert (tp, fp, fn, tn) == (2, 1, 1, 2)
    m = metrics_from_counts(np.array([2, 1, 1, 2]))
    assert m["iou"] == pytest.approx(2 / 4)
    assert m["dice"] == pytest.approx(4 / 6)
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["accuracy"] == pytest.approx(4 / 6)


def test_confusion_counts_shape_mismatch_raises():
    with pytest.raises(ValueError, match="shape"):
        confusion_counts(np.zeros((2, 2), bool), np.zeros((2, 3), bool))


def test_metrics_degenerate_conventions():
    """Empty union (nothing predicted, nothing labelled) is a perfect 1.0
    — the quality-loop convention — and never a ZeroDivisionError."""
    all_negative = metrics_from_counts(np.array([0, 0, 0, 100]))
    assert all_negative["iou"] == 1.0 and all_negative["recall"] == 1.0
    assert all_negative["accuracy"] == 1.0
    missed_everything = metrics_from_counts(np.array([0, 0, 50, 50]))
    assert missed_everything["iou"] == 0.0
    assert missed_everything["recall"] == 0.0
    assert missed_everything["precision"] == 1.0  # nothing predicted


def _write_samples(d, shapes=((64, 64), (64, 96))):
    """Model-ready npzs with known masks; returns {name: mask}."""
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(3)
    masks = {}
    for i, (h, w) in enumerate(shapes):
        name = f"g{i}__layer0"
        channels = rng.random((h, w, 2)).astype(np.float32)
        mask = np.zeros((h, w), np.float32)
        mask[8 : 8 + 10 * (i + 1), 8:24] = 1.0
        np.savez_compressed(os.path.join(d, name + ".npz"),
                            channels=channels, mask=mask)
        masks[name] = mask.astype(bool)
    return masks


def test_evaluate_model_data_micro_equals_pooled_counts(tmp_path):
    """Micro aggregates must be the metrics of the pooled confusion matrix
    computed with the SAME infer outputs (not averages of ratios)."""
    data_dir = str(tmp_path / "model_data")
    masks = _write_samples(data_dir)

    def fake_infer(variables, channels):
        # deterministic pseudo-model: probability from the AOD channel
        probs = channels[..., 0].astype(np.float32)
        return probs, probs > 0.5

    df = evaluate_model_data(fake_infer, None, data_dir, threshold=0.5)
    assert list(df.name[-2:]) == ["micro", "macro"]
    assert len(df) == len(masks) + 2

    pooled = np.zeros(4, np.int64)
    for name, true in masks.items():
        with np.load(os.path.join(data_dir, name + ".npz")) as z:
            pred = z["channels"][..., 0] > 0.5
        pooled += confusion_counts(pred, true)
        row = df[df.name == name].iloc[0]
        expect = metrics_from_counts(confusion_counts(pred, true))
        assert row["iou"] == pytest.approx(expect["iou"])
        assert row["plume_px"] == int(true.sum())
    micro = df[df.name == "micro"].iloc[0]
    expect = metrics_from_counts(pooled)
    for k in ("iou", "dice", "precision", "recall", "accuracy"):
        assert micro[k] == pytest.approx(expect[k])


def test_evaluate_predictions_matching_and_skips(tmp_path, caplog):
    """Predictions are per granule (first layer), so each base scores
    against exactly ONE sample — the layer0-sentinel one when several
    exist (scoring another orbit's labels against a first-layer
    prediction would be the wrong-orbit corruption resolve_layer refuses,
    and double-scoring would double-count pixels in the micro pool);
    samples without predictions are skipped with a warning, not a crash."""
    data_dir = str(tmp_path / "model_data")
    pred_dir = str(tmp_path / "preds")
    os.makedirs(pred_dir)
    masks = _write_samples(data_dir)
    # a second orbit-layer sample for g0 with an INVERTED mask: if it were
    # (wrongly) scored against the first-layer prediction the micro IoU
    # could not be 1.0
    with np.load(os.path.join(data_dir, "g0__layer0.npz")) as z:
        np.savez_compressed(os.path.join(data_dir, "g0__2016123.1030.npz"),
                            channels=z["channels"],
                            mask=1.0 - z["mask"])
    # perfect prediction for g0 only; g1 samples must be skipped
    probs = masks["g0__layer0"].astype(np.float32)
    np.savez_compressed(os.path.join(pred_dir, "g0_pred.npz"),
                        probs=probs, mask=probs > 0.5)

    df = evaluate_predictions(pred_dir, data_dir)
    names = set(df.name)
    assert {"g0__layer0", "micro", "macro"} == names
    assert float(df[df.name == "micro"].iloc[0]["iou"]) == pytest.approx(1.0)


def test_evaluate_predictions_ambiguous_multiorbit_skipped(tmp_path):
    """A multi-orbit granule whose samples all carry REAL timestamps (no
    layer0 sentinel) cannot be paired with a per-granule prediction — it
    must be skipped with a warning, never guessed at."""
    data_dir = str(tmp_path / "model_data")
    pred_dir = str(tmp_path / "preds")
    os.makedirs(data_dir)
    os.makedirs(pred_dir)
    mask = np.zeros((16, 16), np.float32)
    mask[2:6, 2:6] = 1.0
    for ts in ("2016123.1030", "2016123.1210"):
        np.savez_compressed(os.path.join(data_dir, f"gm__{ts}.npz"),
                            channels=np.zeros((16, 16, 2), np.float32),
                            mask=mask)
    np.savez_compressed(os.path.join(pred_dir, "gm_pred.npz"),
                        probs=mask, mask=mask > 0)
    # the single granule is ambiguous → nothing scoreable → ValueError
    with pytest.raises(ValueError, match="match"):
        evaluate_predictions(pred_dir, data_dir)


def test_evaluate_predictions_basename_with_double_underscore(tmp_path):
    """A granule basename itself containing '__' (e.g. scene__v2) must
    match its prediction: only the LAST '__' separates the timestamp."""
    data_dir = str(tmp_path / "model_data")
    pred_dir = str(tmp_path / "preds")
    os.makedirs(data_dir)
    os.makedirs(pred_dir)
    mask = np.zeros((16, 16), np.float32)
    mask[2:6, 2:6] = 1.0
    np.savez_compressed(os.path.join(data_dir, "scene__v2__layer0.npz"),
                        channels=np.zeros((16, 16, 2), np.float32),
                        mask=mask)
    np.savez_compressed(os.path.join(pred_dir, "scene__v2_pred.npz"),
                        probs=mask, mask=mask > 0)
    df = evaluate_predictions(pred_dir, data_dir)
    assert "scene__v2__layer0" in set(df.name)
    assert float(df[df.name == "micro"].iloc[0]["iou"]) == pytest.approx(1.0)


def test_evaluate_predictions_no_match_raises(tmp_path):
    data_dir = str(tmp_path / "model_data")
    pred_dir = str(tmp_path / "preds")
    os.makedirs(pred_dir)
    _write_samples(data_dir)
    probs = np.zeros((4, 4), np.float32)
    np.savez_compressed(os.path.join(pred_dir, "other_pred.npz"),
                        probs=probs, mask=probs > 0.5)
    with pytest.raises(ValueError, match="match"):
        evaluate_predictions(pred_dir, data_dir)


def test_write_report_and_cli_e2e(tmp_path, capsys):
    """CLI: evaluate_model --predictions scores saved NPZs, writes the
    report CSV, and prints one JSON summary line."""
    import pandas as pd

    from plumekit.cli import main

    root = str(tmp_path / "root")
    data_dir = os.path.join(root, "model_data")
    pred_dir = os.path.join(root, "preds")
    os.makedirs(pred_dir)
    masks = _write_samples(data_dir)
    for name, mask in masks.items():
        base = name.split("__")[0]
        probs = mask.astype(np.float32)
        np.savez_compressed(os.path.join(pred_dir, base + "_pred.npz"),
                            probs=probs, mask=mask)
    out_csv = os.path.join(root, "eval.csv")
    rc = main(["evaluate_model", "--root", root, "--data", data_dir,
               "--predictions", pred_dir, "--out", out_csv])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["samples"] == len(masks)
    assert summary["iou"] == pytest.approx(1.0)
    table = pd.read_csv(out_csv)
    assert set(table.name) == set(masks) | {"micro", "macro"}


def test_evaluate_model_data_with_real_unet(tmp_path):
    """Inference mode end-to-end with the real U-Net + sliding infer on a
    non-tile-aligned sample (pads and crops internally)."""
    import jax

    from plumekit.config.train import InferConfig, UNetConfig
    from plumekit.infer import make_sliding_infer
    from plumekit.models import UNet

    data_dir = str(tmp_path / "model_data")
    _write_samples(data_dir, shapes=((48, 56),))
    cfg = UNetConfig(in_channels=2, base_features=8, depth=2,
                     compute_dtype="float32")
    model = UNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 2), np.float32),
                           train=False)
    infer = make_sliding_infer(model.apply,
                               InferConfig(tile_size=32, overlap=8),
                               channels=2)
    df = evaluate_model_data(infer, variables, data_dir)
    row = df[df.name == "micro"].iloc[0]
    assert 0.0 <= row["iou"] <= 1.0
    assert np.isfinite([row[k] for k in
                        ("iou", "dice", "precision", "recall")]).all()


def test_bootstrap_ci_scene_level():
    """Scene-level bootstrap: a single scene collapses the CI to the
    point estimate; heterogeneous scenes produce a real interval that
    brackets the pooled point."""
    from plumekit.train.evaluate import bootstrap_ci, metrics_from_counts

    one = np.array([[80, 10, 10, 900]], np.int64)
    ci = bootstrap_ci(one, metrics_from_counts, n_boot=50)
    point = metrics_from_counts(one[0])
    for k, (lo, hi) in ci.items():
        assert lo == pytest.approx(point[k]) and hi == pytest.approx(point[k])

    many = np.array([[80, 10, 10, 900], [20, 40, 40, 900],
                     [60, 5, 5, 930], [10, 60, 60, 870]], np.int64)
    ci = bootstrap_ci(many, metrics_from_counts, n_boot=500, seed=1)
    pooled = metrics_from_counts(many.sum(axis=0))
    for k, (lo, hi) in ci.items():
        assert lo <= pooled[k] <= hi
        assert lo < hi  # heterogeneous scenes: a genuine interval
    # deterministic under the seed
    assert ci == bootstrap_ci(many, metrics_from_counts, n_boot=500, seed=1)

    with pytest.raises(ValueError, match="n_boot"):
        bootstrap_ci(many, metrics_from_counts, n_boot=0)
    with pytest.raises(ValueError, match="sample_counts"):
        bootstrap_ci(many[0], metrics_from_counts)


def test_bootstrap_from_saved_report(tmp_path):
    """The per-sample count columns persist through the CSV, so the CI
    is recomputable offline from any saved report."""
    import pandas as pd

    from plumekit.train.evaluate import (bootstrap_from_df,
                                         evaluate_predictions)

    data_dir = str(tmp_path / "model_data")
    pred_dir = str(tmp_path / "preds")
    _write_samples(data_dir)
    os.makedirs(pred_dir)
    # standard fixture naming: predictions per granule base
    for fname in sorted(os.listdir(data_dir)):
        base = fname[:-len(".npz")].rpartition("__")[0]
        with np.load(os.path.join(data_dir, fname)) as d:
            probs = np.where(d["mask"] > 0, 0.9, 0.2).astype(np.float32)
        np.savez_compressed(os.path.join(pred_dir, f"{base}_pred.npz"),
                            probs=probs)
    df = evaluate_predictions(pred_dir, data_dir)
    out = str(tmp_path / "eval.csv")
    df.to_csv(out, index=False)
    ci = bootstrap_from_df(pd.read_csv(out), n_boot=200)
    assert set(ci) == {"iou", "dice", "precision", "recall", "accuracy"}
    # a table without the count columns is rejected with guidance
    legacy = pd.read_csv(out).drop(columns=["tp", "fp", "fn", "tn"])
    with pytest.raises(ValueError, match="count columns"):
        bootstrap_from_df(legacy)


def test_cli_bootstrap_json(tmp_path, capsys):
    """--bootstrap adds ci95 to both the pixel and the plume summaries."""
    import json

    from plumekit.cli import main
    from plumekit.config.paths import PathsConfig

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    rng = np.random.default_rng(0)
    for i in range(3):
        true = np.zeros((32, 32), np.float32)
        true[4 + i:12 + i, 4:12] = 1.0
        probs = np.clip(np.where(true > 0, 0.9, 0.1)
                        + rng.normal(0, 0.05, true.shape), 0, 1)
        np.savez_compressed(
            os.path.join(paths.ensure("model_data_dir"),
                         f"g{i}__layer0.npz"),
            channels=np.zeros((32, 32, 2), np.float32), mask=true)
        np.savez_compressed(
            os.path.join(paths.ensure("predictions_dir"),
                         f"g{i}_pred.npz"),
            probs=probs.astype(np.float32))
    pred = paths.resolve("predictions_dir")
    assert main(["evaluate_model", "--root", root, "--predictions", pred,
                 "--bootstrap", "100"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["ci95"]) >= {"iou", "dice"}
    lo, hi = out["ci95"]["iou"]
    assert 0.0 <= lo <= out["iou"] <= hi <= 1.0
    assert main(["evaluate_model", "--root", root, "--predictions", pred,
                 "--objects", "--bootstrap", "100"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["ci95"]) == {"obj_precision", "obj_recall", "obj_f1"}
    assert main(["evaluate_model", "--root", root, "--predictions", pred,
                 "--bootstrap", "-1"]) == 1
