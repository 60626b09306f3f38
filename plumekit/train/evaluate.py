"""Standalone model evaluation: a checkpointed (or AOT-exported) U-Net
scored against model-ready labels — per-granule and pooled IoU / dice /
precision / recall, as its own framework surface.

The reference promises the cookiecutter model pair (``src/models/`` is
empty per SURVEY.md §0) and never ships a measurement step: quality
judgements live in the curator's eyeballs (``plume_selector.py:137-233``).
plumekit already *measures* — the train loop's dev-IoU early stopping and
``experiments/quality_loop.py``'s GT-dev studies — but both are embedded;
``evaluate_model`` productionises the measurement for real checkpoints
against real curated/weak labels: the artifact a model card cites.

Two modes share one scorer:

* **inference mode** — run sliding-window inference on each sample's
  stored channels (layer-correct by construction: the channels were
  assembled from the hull row's own orbit layer);
* **predictions mode** — score ``predict_model`` output NPZs that already
  exist, matched to samples by granule basename.

Counts are exact int64 pixel tallies, so "micro" aggregates are the
metrics of the pooled confusion matrix, not averages of ratios.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd

from plumekit.utils import get_logger

logger = get_logger(__name__)

#: metric column order shared by rows and aggregates
METRIC_KEYS = ("iou", "dice", "precision", "recall", "accuracy")


def confusion_counts(pred_mask: np.ndarray,
                     true_mask: np.ndarray) -> np.ndarray:
    """Exact pixel confusion tallies ``[tp, fp, fn, tn]`` (int64)."""
    if pred_mask.shape != true_mask.shape:
        raise ValueError(
            f"prediction shape {pred_mask.shape} != label shape "
            f"{true_mask.shape}")
    pred = np.asarray(pred_mask, dtype=bool)
    true = np.asarray(true_mask, dtype=bool)
    tp = np.count_nonzero(pred & true)
    fp = np.count_nonzero(pred & ~true)
    fn = np.count_nonzero(~pred & true)
    tn = pred.size - tp - fp - fn
    return np.array([tp, fp, fn, tn], dtype=np.int64)


def _ratio(num: float, den: float, empty: float = 1.0) -> float:
    """Shared degenerate-denominator convention for the pixel AND plume
    metrics: an empty denominator scores ``empty`` (1.0 by default — no
    plume predicted, none labelled is a perfect agreement)."""
    return num / den if den > 0 else empty


def metrics_from_counts(counts: np.ndarray) -> Dict[str, float]:
    """IoU / dice / precision / recall / accuracy from ``[tp,fp,fn,tn]``.

    Degenerate denominators follow the quality-loop conventions: an empty
    union (no plume predicted, none labelled) is a perfect 1.0, an empty
    positive set under a non-empty counterpart is 0.0."""
    tp, fp, fn, tn = (float(c) for c in counts)
    return {
        "iou": _ratio(tp, tp + fp + fn),
        "dice": _ratio(2 * tp, 2 * tp + fp + fn),
        "precision": _ratio(tp, tp + fp),
        "recall": _ratio(tp, tp + fn),
        "accuracy": _ratio(tp + tn, tp + fp + fn + tn, empty=0.0),
    }


def load_model_data(model_data_dir: str) -> List[Tuple[str, str]]:
    """(sample name, npz path) for every model-ready sample, sorted.

    Sample names are the npz stems ``{granule}__{ts}`` that
    ``build_model_data`` writes (``train/curated.py``)."""
    if not os.path.isdir(model_data_dir):
        raise FileNotFoundError(
            f"model-data directory {model_data_dir!r} does not exist; run "
            "'plumekit prepare_model_data' (or point --data at it)")
    out = [(fname[:-len(".npz")], os.path.join(model_data_dir, fname))
           for fname in sorted(os.listdir(model_data_dir))
           if fname.endswith(".npz")]
    if not out:
        raise FileNotFoundError(
            f"no model-ready samples in {model_data_dir}")
    return out


def _summarise(rows: List[Dict]) -> List[Dict]:
    """Micro (pooled-count) and macro (mean-of-samples) aggregate rows."""
    pooled = np.sum([r["_counts"] for r in rows], axis=0)
    micro = {"name": "micro", "plume_px": int(pooled[0] + pooled[2]),
             **metrics_from_counts(pooled),
             **dict(zip(PIXEL_COUNT_COLS, (int(c) for c in pooled)))}
    macro = {"name": "macro",
             "plume_px": int(np.mean([r["plume_px"] for r in rows])),
             **{k: float(np.mean([r[k] for r in rows]))
                for k in METRIC_KEYS}}
    return [micro, macro]


#: exact-count columns persisted per sample (they make every report
#: re-poolable offline — and feed the scene-level bootstrap)
PIXEL_COUNT_COLS = ("tp", "fp", "fn", "tn")
OBJECT_COUNT_COLS = ("obj_tp", "obj_fp", "obj_fn")


def _score_rows(pairs: Iterable[Tuple[str, np.ndarray, np.ndarray]]
                ) -> pd.DataFrame:
    """Shared scorer: (name, pred bool, true bool) → per-sample rows +
    micro/macro aggregates (aggregates carry name 'micro'/'macro')."""
    rows: List[Dict] = []
    for name, pred, true in pairs:
        counts = confusion_counts(pred, true)
        rows.append({"name": name,
                     "plume_px": int(counts[0] + counts[2]),
                     **metrics_from_counts(counts), "_counts": counts})
    if not rows:
        raise ValueError("nothing to evaluate: no (prediction, label) pairs")
    summary = _summarise(rows)
    for r in rows:
        r.update(zip(PIXEL_COUNT_COLS, (int(c) for c in r.pop("_counts"))))
    return pd.DataFrame(rows + summary)


def bootstrap_ci(
    sample_counts: np.ndarray,
    metric_fn: Callable[[np.ndarray], Dict[str, float]],
    n_boot: int = 1000,
    seed: int = 0,
    alpha: float = 0.05,
) -> Dict[str, Tuple[float, float]]:
    """Scene-level bootstrap CI of the POOLED metrics.

    ``sample_counts`` is the (samples, k) per-scene confusion-count
    matrix; scenes are resampled with replacement ``n_boot`` times, each
    resample pooled and pushed through ``metric_fn`` (percentile
    interval, default 95%). Scenes — not pixels — are the exchangeable
    unit here: pixels within a scene are spatially correlated, so a
    pixel bootstrap would be dishonestly tight. This turns the quality
    protocol's informal "±0.02 run variance" caveat (BASELINE.md) into a
    per-evaluation number."""
    counts = np.asarray(sample_counts, dtype=np.int64)
    if counts.ndim != 2 or counts.shape[0] < 1:
        raise ValueError(
            f"sample_counts must be (samples, k), got {counts.shape}")
    if n_boot < 1:
        raise ValueError(f"n_boot must be >= 1, got {n_boot}")
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, counts.shape[0], size=(n_boot, counts.shape[0]))
    pooled = counts[idx].sum(axis=1)
    keys = list(metric_fn(pooled[0]).keys())
    vals = np.array([[m[k] for k in keys]
                     for m in (metric_fn(p) for p in pooled)])
    lo = np.percentile(vals, 100 * alpha / 2, axis=0)
    hi = np.percentile(vals, 100 * (1 - alpha / 2), axis=0)
    return {k: (float(a), float(b)) for k, a, b in zip(keys, lo, hi)}


def bootstrap_from_df(df: pd.DataFrame, kind: str = "pixel",
                      n_boot: int = 1000, seed: int = 0
                      ) -> Dict[str, Tuple[float, float]]:
    """CI from a persisted evaluation table (the per-sample count
    columns), so the bootstrap works offline on any saved report CSV."""
    cols, fn = ((PIXEL_COUNT_COLS, metrics_from_counts)
                if kind == "pixel"
                else (OBJECT_COUNT_COLS, object_metrics_from_counts))
    rows = df[~df.name.isin(("micro", "macro"))]
    missing = [c for c in cols if c not in rows.columns]
    if missing:
        raise ValueError(
            f"table lacks count columns {missing}; re-run evaluate_model "
            "(older reports predate the per-sample counts)")
    return bootstrap_ci(rows[list(cols)].to_numpy(), fn,
                        n_boot=n_boot, seed=seed)


def inference_prob_pairs(
    infer: Callable,
    variables,
    model_data_dir: str,
) -> Iterable[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, probability map, true bool mask) for every model-ready
    sample via ``infer(variables, channels) -> (probs, _)`` — the shared
    source for scoring at one threshold and for the threshold sweep."""
    for name, path in load_model_data(model_data_dir):
        with np.load(path) as data:
            channels = data["channels"]
            true = data["mask"].astype(bool)
        probs = np.asarray(infer(variables, channels)[0])
        yield name, probs, true


def evaluate_model_data(
    infer: Callable,
    variables,
    model_data_dir: str,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Run ``infer(variables, channels) -> (probs, _)`` over every
    model-ready sample and score against its stored mask."""
    return _score_rows(
        (name, probs > threshold, true)
        for name, probs, true in inference_prob_pairs(
            infer, variables, model_data_dir))


def prediction_prob_pairs(
    predictions_dir: str,
    model_data_dir: str,
) -> Iterable[Tuple[str, np.ndarray, np.ndarray]]:
    """(name, probability map, true bool mask) for saved ``predict_model``
    NPZs matched to model-ready labels — the matching/layer rules of
    :func:`evaluate_predictions`, which consumes this; the threshold
    sweep consumes it too. uint8 quantized-output predictions decode to
    [0, 1] here so thresholds mean the same thing for both dtypes.

    Predictions are per GRANULE and ``predict_model`` infers on the
    granule's first orbit layer (``infer/streaming.py``), so each granule
    scores against exactly ONE sample: its ``layer0``-sentinel sample, or
    its only sample. A multi-orbit granule whose samples all carry real
    timestamps is skipped with a warning instead of guessed at — scoring
    another orbit's labels against a first-layer prediction is the exact
    wrong-orbit corruption the strict layer rule exists to refuse
    (``io/granule.resolve_layer``), and double-scoring one prediction
    against several layers would double-count its pixels in the pooled
    micro row. Samples without a prediction are skipped with a warning
    rather than failing the run — predict and prepare_model_data
    legitimately cover different granule subsets mid-campaign."""
    from plumekit.io.granule import LAYER0_SENTINEL

    samples = load_model_data(model_data_dir)
    preds: Dict[str, str] = {
        fname[:-len("_pred.npz")]: os.path.join(predictions_dir, fname)
        for fname in sorted(os.listdir(predictions_dir))
        if fname.endswith("_pred.npz")
    }
    if not preds:
        raise FileNotFoundError(
            f"no *_pred.npz predictions in {predictions_dir}; run "
            "'plumekit predict_model' first")

    # group layer samples per granule basename: the LAST "__" separates
    # basename from the orbit timestamp (build_model_data writes
    # f"{base}__{ts}"); a basename itself containing "__" survives intact
    by_base: Dict[str, List[Tuple[str, str, str]]] = {}
    for name, path in samples:
        base, _, ts = name.rpartition("__")
        if not base:        # no "__" at all: the whole name is the base
            base, ts = ts, LAYER0_SENTINEL
        by_base.setdefault(base, []).append((name, ts, path))

    matched = 0
    for base, group in by_base.items():
        if base not in preds:
            for name, _, _ in group:
                logger.warning("no prediction for sample %s — skipped",
                               name)
            continue
        chosen = [g for g in group if g[1] == LAYER0_SENTINEL]
        if not chosen and len(group) == 1:
            chosen = group          # single-layer granule, real ts
        if not chosen:
            logger.warning(
                "%s has %d orbit-layer samples (%s) but predictions "
                "are per granule (first layer) — cannot pick a layer; "
                "skipped. Use inference mode (no --predictions) to "
                "score every layer sample.", base, len(group),
                ", ".join(g[1] for g in group))
            continue
        for name, _, path in chosen[:1]:
            if len(group) > 1:
                logger.warning(
                    "%s: scoring only %s against the granule "
                    "prediction; %d other layer sample(s) skipped",
                    base, name, len(group) - 1)
            matched += 1
            with np.load(preds[base]) as pdata:
                probs = pdata["probs"]
                if probs.dtype == np.uint8:
                    from plumekit.ops.quant import dequantize_probs_uint8

                    probs = dequantize_probs_uint8(probs)
            with np.load(path) as data:
                true = data["mask"].astype(bool)
            yield name, probs, true
    if not matched:
        raise ValueError(
            f"none of the {len(samples)} samples in {model_data_dir} "
            f"match a prediction in {predictions_dir}")


def evaluate_predictions(
    predictions_dir: str,
    model_data_dir: str,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Score saved ``predict_model`` NPZs against model-ready labels at
    one threshold (matching/layer rules: see
    :func:`prediction_prob_pairs`)."""
    return _score_rows(
        (name, probs > threshold, true)
        for name, probs, true in prediction_prob_pairs(
            predictions_dir, model_data_dir))


def sweep_thresholds(
    prob_pairs: Iterable[Tuple[str, np.ndarray, np.ndarray]],
    thresholds: Optional[np.ndarray] = None,
) -> pd.DataFrame:
    """Pooled (micro) metrics at every candidate decision threshold.

    One pass over the samples: per-threshold confusion counts accumulate
    from each probability map before it is dropped, so memory stays one
    map regardless of dataset size. The default grid is 0.05..0.95 in
    steps of 0.05 — the serving mask's operating curve. The hardcoded
    0.5 the reference era assumed is rarely the IoU optimum once labels
    are smoothed or noisy (measured: BASELINE.md threshold row)."""
    ts = (np.round(np.arange(0.05, 0.951, 0.05), 2)
          if thresholds is None else np.asarray(thresholds, np.float64))
    if ts.size == 0:
        raise ValueError("no thresholds to sweep")
    if not (np.diff(ts) > 0).all():
        raise ValueError("thresholds must be strictly increasing")

    def above(values: np.ndarray) -> np.ndarray:
        # |{v : v > t}| for every t in ONE sorted pass — searchsorted
        # side='right' keeps the strict-> semantics exact (a prob equal
        # to a threshold must NOT count), which a histogram would blur
        v = np.sort(values, kind="stable")
        return (v.size - np.searchsorted(v, ts, side="right")).astype(
            np.int64)

    counts = np.zeros((ts.size, 4), dtype=np.int64)
    n = 0
    for _name, probs, true in prob_pairs:
        n += 1
        if probs.shape != true.shape:
            raise ValueError(
                f"prediction shape {probs.shape} != label shape "
                f"{true.shape}")
        p = np.asarray(probs).ravel()
        t = np.asarray(true, dtype=bool).ravel()
        tp = above(p[t])
        fp = above(p[~t])
        npos, nneg = int(t.sum()), int((~t).sum())
        counts[:, 0] += tp
        counts[:, 1] += fp
        counts[:, 2] += npos - tp
        counts[:, 3] += nneg - fp
    if n == 0:
        raise ValueError("nothing to sweep: no (probability, label) pairs")
    rows = [{"threshold": float(t), **metrics_from_counts(c)}
            for t, c in zip(ts, counts)]
    return pd.DataFrame(rows)


def object_counts(pred_mask: np.ndarray, true_mask: np.ndarray,
                  match_iou: float = 0.5, min_size: int = 1
                  ) -> np.ndarray:
    """Plume-LEVEL confusion tallies ``[tp, fp, fn]`` (int64).

    Pixel metrics hide the question the campaign actually asks — how
    many PLUMES were found, missed, or invented. Connected components
    of each mask (8-connected, the detectors' convention, via the native
    union-find CCL) are matched greedily by pairwise IoU, highest first,
    one-to-one; a pair counts as a hit at ``IoU >= match_iou`` (the
    detection convention). ``min_size`` models the reference's own
    accept gate (its identify stage rejects regions < 100 px,
    ``plume_identifier_rg.py:270-275``): PREDICTED components below it
    are pruned (never tp nor fp), and TRUE components below it are
    *ignore* regions — they are not counted as missed, and a prediction
    whose majority support lies on an ignored region is dropped rather
    than charged as a false positive (the standard detection-benchmark
    ignore semantics; pruning GT outright would silently delete missed
    small plumes from the fn count and overstate recall).

    Interaction caveat: the majority-on-ignore drop runs BEFORE IoU
    matching, so a prediction straddling an ignored sub-floor plume and
    a real plume is removed entirely and can convert a would-be tp into
    an fn. This is only reachable at low ``match_iou`` (a straddling
    component cannot reach 0.5 IoU with the real plume alone once most
    of its area lies elsewhere); at the default 0.5 the drop and the
    match can never claim the same component.

    Pairwise intersections come from ONE joint bincount over the two
    label images, so cost is O(pixels + n_pred·n_true)."""
    from plumekit.native import ccl_label

    if pred_mask.shape != true_mask.shape:
        raise ValueError(
            f"prediction shape {pred_mask.shape} != label shape "
            f"{true_mask.shape}")
    if not 0.0 < match_iou <= 1.0:
        raise ValueError(f"match_iou must be in (0, 1], got {match_iou}")
    pl, np_ = ccl_label(np.asarray(pred_mask, bool))
    tl, nt = ccl_label(np.asarray(true_mask, bool))
    if min_size > 1:
        psizes = np.bincount(pl.ravel(), minlength=np_ + 1)
        small_p = psizes < min_size
        small_p[0] = False
        pl[small_p[pl]] = 0
        tsizes = np.bincount(tl.ravel(), minlength=nt + 1)
        small_t = tsizes < min_size
        small_t[0] = False
        if small_t.any():
            ignore = small_t[tl]
            if pl.max() > 0:
                # drop predictions mostly supported by ignored regions:
                # a correct find of a sub-floor plume is not an FP
                area = np.bincount(pl.ravel(), minlength=int(pl.max()) + 1)
                on_ign = np.bincount(pl[ignore].ravel(),
                                     minlength=int(pl.max()) + 1)
                drop = on_ign * 2 > area
                drop[0] = False
                pl[drop[pl]] = 0
            tl[ignore] = 0
        # surviving labels are non-contiguous; count the distinct
        # nonzero labels (len(unique)-1 would miscount when no
        # background pixel remains)
        np_ = int(np.count_nonzero(np.unique(pl)))
        nt = int(np.count_nonzero(np.unique(tl)))
    if np_ == 0 or nt == 0:
        return np.array([0, np_, nt], dtype=np.int64)
    # joint histogram: intersection area of every (pred, true) label pair
    joint = np.bincount(
        (pl.ravel().astype(np.int64) * (tl.max() + 1) + tl.ravel()),
        minlength=(pl.max() + 1) * (tl.max() + 1),
    ).reshape(pl.max() + 1, tl.max() + 1)
    pred_area = joint.sum(axis=1)
    true_area = joint.sum(axis=0)
    inter = joint[1:, 1:].astype(np.float64)
    union = (pred_area[1:, None] + true_area[None, 1:] - inter)
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    # greedy one-to-one matching, best IoU first (exact for the
    # detection-metric convention)
    tp = 0
    used_p: set = set()
    used_t: set = set()
    order = np.argsort(iou, axis=None)[::-1]
    for flat in order:
        i, j = divmod(int(flat), iou.shape[1])
        if iou[i, j] < match_iou:
            break
        if i in used_p or j in used_t:
            continue
        used_p.add(i)
        used_t.add(j)
        tp += 1
    n_pred = int((pred_area[1:] > 0).sum())
    n_true = int((true_area[1:] > 0).sum())
    return np.array([tp, n_pred - tp, n_true - tp], dtype=np.int64)


def object_metrics_from_counts(counts: np.ndarray) -> Dict[str, float]:
    """Plume-level precision/recall/F1 from pooled ``[tp, fp, fn]``
    (same degenerate-denominator convention as the pixel metrics)."""
    tp, fp, fn = (float(c) for c in counts)
    return {"obj_precision": _ratio(tp, tp + fp),
            "obj_recall": _ratio(tp, tp + fn),
            "obj_f1": _ratio(2 * tp, 2 * tp + fp + fn)}


def evaluate_objects(
    prob_pairs: Iterable[Tuple[str, np.ndarray, np.ndarray]],
    threshold: float = 0.5,
    match_iou: float = 0.5,
    min_size: int = 1,
) -> pd.DataFrame:
    """Per-sample + pooled plume-level detection table over probability
    pairs (the same generators the pixel scorer and the sweep use)."""
    rows: List[Dict] = []
    for name, probs, true in prob_pairs:
        c = object_counts(probs > threshold, true, match_iou, min_size)
        rows.append({"name": name, "pred_plumes": int(c[0] + c[1]),
                     "true_plumes": int(c[0] + c[2]),
                     **object_metrics_from_counts(c), "_counts": c})
    if not rows:
        raise ValueError("nothing to evaluate: no (prediction, label) pairs")
    pooled = np.sum([r["_counts"] for r in rows], axis=0)
    summary = {"name": "micro",
               "pred_plumes": int(pooled[0] + pooled[1]),
               "true_plumes": int(pooled[0] + pooled[2]),
               **object_metrics_from_counts(pooled),
               **dict(zip(OBJECT_COUNT_COLS, (int(c) for c in pooled)))}
    for r in rows:
        r.update(zip(OBJECT_COUNT_COLS, (int(c) for c in r.pop("_counts"))))
    return pd.DataFrame(rows + [summary])


#: object-level metric names accepted by the threshold sweep
OBJECT_METRIC_KEYS = ("obj_precision", "obj_recall", "obj_f1")


def objects_csv_path(evaluation_csv: str) -> str:
    """The plume-level report lives next to the pixel-level one. Single
    source of the name contract shared by the writer (``cli
    evaluate_model --objects``) and the reader (``viz/report.py``)."""
    return os.path.join(os.path.dirname(evaluation_csv) or ".",
                        "evaluation_objects.csv")


def sweep_object_thresholds(
    prob_pairs: Iterable[Tuple[str, np.ndarray, np.ndarray]],
    thresholds: Optional[np.ndarray] = None,
    match_iou: float = 0.5,
    min_size: int = 1,
) -> pd.DataFrame:
    """Pooled PLUME-level metrics at every candidate threshold.

    The pixel-IoU optimum and the plume-detection optimum genuinely
    differ (measured: the pixel-optimal 0.70 tightens masks enough to
    fragment detections, dropping plume F1 0.913 → 0.851 vs 0.5 —
    BASELINE.md object row), so the sweep must run in the metric the
    campaign serves for. Each threshold re-labels the thresholded masks
    (host CCL, O(pixels) per threshold) — probability maps are
    materialised once, so memory is the dev set, not one map."""
    ts = (np.round(np.arange(0.05, 0.951, 0.05), 2)
          if thresholds is None else np.asarray(thresholds, np.float64))
    if ts.size == 0:
        raise ValueError("no thresholds to sweep")
    pairs = list(prob_pairs)
    if not pairs:
        raise ValueError("nothing to sweep: no (probability, label) pairs")
    rows = []
    for t in ts:
        pooled = np.sum([object_counts(probs > t, true, match_iou,
                                       min_size)
                         for _n, probs, true in pairs], axis=0)
        rows.append({"threshold": float(t),
                     **object_metrics_from_counts(pooled)})
    return pd.DataFrame(rows)


def best_threshold(sweep: pd.DataFrame, metric: str = "iou"
                   ) -> Tuple[float, float]:
    """(threshold, value) maximising ``metric`` over a sweep table; ties
    resolve to the threshold nearest 0.5 (the least surprising mask)."""
    if metric not in sweep.columns:
        raise ValueError(f"metric {metric!r} not in sweep table")
    vals = sweep[metric].to_numpy()
    best = vals.max()
    cand = sweep.threshold.to_numpy()[vals == best]
    t = float(cand[np.argmin(np.abs(cand - 0.5))])
    return t, float(best)


def write_report(df: pd.DataFrame, out_csv: Optional[str]) -> Dict:
    """Persist the per-sample table and return the micro summary dict
    (the one-line machine-readable result the CLI prints)."""
    if out_csv:
        os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
        df.to_csv(out_csv, index=False)
        logger.info("wrote %s (%d rows)", out_csv, len(df))
    micro = df[df.name == "micro"].iloc[0]
    return {"samples": int(len(df) - 2),
            **{k: round(float(micro[k]), 4) for k in METRIC_KEYS}}
