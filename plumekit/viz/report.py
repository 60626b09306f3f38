"""Campaign report generator — the content of the reference's promised but
empty ``reports/`` tree (cookiecutter layout, ``/root/reference/reports/``
holds only ``.gitkeep``; ``README.md:50-52`` promises "Generated analysis
as HTML, PDF, LaTeX, etc.").

``plumekit report`` walks a workspace root and writes
``reports/report.md`` (+ ``reports/figures/``) summarising whatever stages
of the pipeline have run: raw data, identify outputs, curation decisions,
model-ready samples, training metrics (with a loss/IoU figure), saved
predictions, and the evaluation table. Every section is optional — a
partially-run campaign reports the stages it has."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from plumekit.config import PathsConfig
from plumekit.utils import get_logger

logger = get_logger(__name__)


def _count_files(d: str, suffixes) -> List[str]:
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(tuple(suffixes)))


def _hull_stats(hull_dir: str):
    """(n files, n plume rows, n unique plumes) over ``*_extent.csv``."""
    import pandas as pd

    files = _count_files(hull_dir, ["_extent.csv"])
    rows = plumes = 0
    for f in files:
        try:
            df = pd.read_csv(os.path.join(hull_dir, f))
        except Exception as e:                      # noqa: BLE001
            logger.warning("unreadable hull CSV %s: %s", f, e)
            continue
        rows += len(df)
        if "id" in df.columns and "datetime" in df.columns:
            plumes += df.groupby(["datetime", "id"]).ngroups
        elif "id" in df.columns:
            plumes += df.id.nunique()
        elif "plume_id" in df.columns:              # basic-detector bboxes
            plumes += df.plume_id.nunique()
    return len(files), rows, plumes


def build_report(root: str, out_dir: Optional[str] = None) -> str:
    """Write ``<root>/reports/report.md`` (+ figures) and return its path."""
    from plumekit.io.granule import GRANULE_EXTENSIONS

    paths = PathsConfig(root=root)
    out_dir = out_dir or os.path.join(root, "reports")
    fig_dir = os.path.join(out_dir, "figures")
    os.makedirs(fig_dir, exist_ok=True)
    lines: List[str] = ["# plumekit campaign report", ""]

    # --- raw data -------------------------------------------------------
    granules = _count_files(paths.resolve("maiac_dir"), GRANULE_EXTENSIONS)
    fire_csvs = _count_files(paths.resolve("fires_dir"), [".csv"])
    lines += ["## Data", ""]
    lines.append(f"* granules: **{len(granules)}** in `{paths.maiac_dir}`")
    if fire_csvs:
        import pandas as pd

        for f in fire_csvs:
            try:
                count = "{} detections".format(len(pd.read_csv(
                    os.path.join(paths.resolve("fires_dir"), f))))
            except Exception:                       # noqa: BLE001
                count = "unreadable"
            lines.append(f"* fire table `{f}`: {count}")
    viirs_aod = _count_files(paths.resolve("viirs_aod_dir"), [".h5"])
    if viirs_aod:
        lines.append(f"* VIIRS IVAOT granules: {len(viirs_aod)}")
    lines.append("")

    # --- identify (build_features) --------------------------------------
    nf, nrows, nplumes = _hull_stats(paths.resolve("hull_df_dir"))
    if nf:
        lines += ["## Identify (weak labeller)", "",
                  f"* hull CSVs: **{nf}** granules, {nplumes} plumes "
                  f"({nrows} hull rows)"]
        masks = _count_files(paths.resolve("plume_mask_dir"),
                             ["_masks.npz"])
        if masks:
            lines.append(f"* per-plume device masks: {len(masks)} granules")
        lines.append("")

    # --- curation --------------------------------------------------------
    kept_dir = paths.resolve("reduced_plume_hull_dir")
    rej_dir = paths.resolve("reduced_not_plume_hull_dir")
    kf, _, kp = _hull_stats(kept_dir)
    rf, _, rp = _hull_stats(rej_dir)
    if kf or rf:
        total = kp + rp
        pct = 100.0 * kp / total if total else 0.0
        # union of basenames: an asymmetric tree (all-kept granule A +
        # all-rejected granule B, or pruned empty CSVs) must not undercount
        n_gran = len(set(_count_files(kept_dir, ["_extent.csv"]))
                     | set(_count_files(rej_dir, ["_extent.csv"])))
        lines += ["## Curation", "",
                  f"* kept **{kp}** / rejected {rp} plumes "
                  f"({pct:.0f}% acceptance) across {n_gran} granules",
                  ""]

    # --- model data ------------------------------------------------------
    md = _count_files(paths.resolve("model_data_dir"), [".npz"])
    if md:
        frac = []
        for f in md:
            with np.load(os.path.join(paths.resolve("model_data_dir"),
                                      f)) as z:
                frac.append(float(z["mask"].mean()))
        lines += ["## Model-ready data", "",
                  f"* samples: **{len(md)}**, mean plume coverage "
                  f"{100 * float(np.mean(frac)):.2f}% of pixels", ""]

    # --- training --------------------------------------------------------
    ckpt_dir = os.path.join(root, paths.model_dir, "checkpoints")
    from plumekit.train.checkpoint import latest_step

    last = latest_step(ckpt_dir)
    metrics_csv = ckpt_dir.rstrip("/") + "_metrics.csv"
    if last is not None or os.path.exists(metrics_csv):
        lines += ["## Training", ""]
        if last is not None:
            lines.append(f"* latest checkpoint: step **{last}** "
                         f"(`{os.path.relpath(ckpt_dir, root)}`)")
        if os.path.exists(metrics_csv):
            import pandas as pd

            m = pd.read_csv(metrics_csv)
            if len(m):
                tail = m.iloc[-1]
                lines.append(
                    f"* {len(m)} logged steps; last: loss "
                    f"{tail.get('loss', float('nan')):.4f}, IoU "
                    f"{tail.get('iou', float('nan')):.3f}")
                fig = _plot_metrics(m, os.path.join(fig_dir, "training.png"))
                if fig:
                    lines.append("* ![training curves](figures/training.png)")
        lines.append("")

    # --- predictions -----------------------------------------------------
    pred_dir = paths.resolve("predictions_dir")
    preds = _count_files(pred_dir, ["_pred.npz"])
    if preds:
        cov = []
        for f in preds:
            with np.load(os.path.join(pred_dir, f)) as z:
                cov.append(float((z["probs"] > 0.5).mean()))
        lines += ["## Predictions", "",
                  f"* granule predictions: **{len(preds)}**, mean plume "
                  f"coverage {100 * float(np.mean(cov)):.2f}%", ""]

    # --- evaluation ------------------------------------------------------
    eval_csv = paths.resolve("evaluation_csv")
    if os.path.exists(eval_csv):
        import pandas as pd

        ev = pd.read_csv(eval_csv)
        micro = ev[ev.name == "micro"]
        if len(micro):
            r = micro.iloc[0]
            # scene-level bootstrap CI when the table carries the
            # per-sample count columns (legacy reports predate them)
            ci = {}
            try:
                from plumekit.train.evaluate import bootstrap_from_df
                ci = bootstrap_from_df(ev, n_boot=1000)
            except (ValueError, KeyError):
                pass
            lines += ["## Evaluation", "",
                      "| metric | value |" + (" 95% CI |" if ci else ""),
                      "|---|---|" + ("---|" if ci else "")]
            for k in ("iou", "dice", "precision", "recall", "accuracy"):
                if k in ev.columns:
                    row = f"| {k} | {float(r[k]):.4f} |"
                    if ci:
                        lo, hi = ci.get(k, (float("nan"),) * 2)
                        row += f" [{lo:.4f}, {hi:.4f}] |"
                    lines.append(row)
            lines += ["",
                      f"(pooled over {len(ev) - 2} samples; per-sample "
                      f"rows in `{paths.evaluation_csv}`"
                      + ("; CI = scene-level bootstrap, 1000 resamples"
                         if ci else "") + ")", ""]

    from plumekit.train.evaluate import objects_csv_path

    obj_csv = objects_csv_path(eval_csv)
    if os.path.exists(obj_csv):
        import pandas as pd

        ob = pd.read_csv(obj_csv)
        micro = ob[ob.name == "micro"]
        if len(micro):
            r = micro.iloc[0]
            lines += ["## Plume-level detection", "",
                      f"- plumes found: **{int(r.pred_plumes)}** predicted"
                      f" vs {int(r.true_plumes)} labelled",
                      f"- precision {float(r.obj_precision):.3f} / recall "
                      f"{float(r.obj_recall):.3f} / F1 "
                      f"**{float(r.obj_f1):.3f}** "
                      f"(`evaluate_model --objects`)", ""]

    tpath = os.path.join(root, paths.model_dir, "threshold.json")
    if os.path.exists(tpath):
        import json

        try:
            with open(tpath) as f:
                tp = json.load(f)
            # valid JSON need not be an object (a bare number parses
            # fine) — skip the section rather than crash on tp.get
            if isinstance(tp, dict):
                lines += ["## Serving calibration", "",
                          f"- decision threshold **{tp.get('threshold')}** "
                          f"(dev {tp.get('metric')}={tp.get('value')}, "
                          f"measured {tp.get('measured_utc', '?')}) — "
                          "served automatically by predict/serve/export",
                          ""]
        except (ValueError, OSError):
            pass

    if len(lines) <= 6:
        lines += ["*(empty workspace: run `plumekit make_dataset` / "
                  "`build_features` / `train_model` first)*", ""]
    out = os.path.join(out_dir, "report.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    logger.info("wrote %s", out)
    return out


def _plot_metrics(m, out_path: str) -> bool:
    """Loss/IoU curves from the MetricsWriter CSV; returns False when the
    CSV lacks the expected columns."""
    if "step" not in m.columns or "loss" not in m.columns:
        return False
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax1 = plt.subplots(figsize=(7, 3.2))
    ax1.plot(m["step"], m["loss"], color="#4477aa", label="loss")
    ax1.set_xlabel("step")
    ax1.set_ylabel("loss", color="#4477aa")
    if "iou" in m.columns:
        ax2 = ax1.twinx()
        ax2.plot(m["step"], m["iou"], color="#cc6677", label="IoU")
        ax2.set_ylabel("train IoU", color="#cc6677")
        ax2.set_ylim(0, 1)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return True
