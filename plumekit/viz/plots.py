"""Scene/prediction plotting (matplotlib Agg, never blocks compute)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_identify_bboxes(aod: np.ndarray, aod_df, out_path: str,
                         vmin: float = 0, vmax: float = 1) -> None:
    """AOD image with red plume bounding boxes — the rg main's plot
    (``plume_identifier_rg.py:584-596`` semantics)."""
    plt = _plt()
    import matplotlib.patches as mpatches

    fig, ax = plt.subplots(figsize=(10, 6))
    ax.imshow(aod, cmap="gray", interpolation="None", vmin=vmin, vmax=vmax)
    for _, r in aod_df.iterrows():
        rect = mpatches.Rectangle(
            (r.plume_min_col, r.plume_min_row),
            r.plume_max_col - r.plume_min_col,
            r.plume_max_row - r.plume_min_row,
            fill=False, edgecolor="red", linewidth=1,
        )
        ax.add_patch(rect)
    plt.xticks([])
    plt.yticks([])
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def plot_identify_hulls(aod: np.ndarray, hull_df, out_path: str,
                        vmin: float = 0, vmax: float = 1) -> None:
    """AOD image with dashed hull outlines — the gaussian main's plot
    (``plume_identifier_gaussian_profile.py:628-636`` semantics)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.imshow(aod, cmap="gray", interpolation="None", vmin=vmin, vmax=vmax)
    for pid in hull_df.id.unique():
        sub = hull_df[hull_df.id == pid]
        ax.plot(sub.hull_x, sub.hull_y, "r--", lw=0.5)
    plt.xticks([])
    plt.yticks([])
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def plot_prediction(aod: np.ndarray, probs: np.ndarray, out_path: str,
                    threshold: float = 0.5) -> None:
    """AOD | probability | mask triptych for a predicted granule."""
    plt = _plt()
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(aod, cmap="gray", vmin=0, vmax=1)
    axes[0].set_title("AOD")
    axes[1].imshow(probs, cmap="magma", vmin=0, vmax=1)
    axes[1].set_title("P(plume)")
    axes[2].imshow(probs > threshold, cmap="gray")
    axes[2].set_title(f"mask @ {threshold}")
    for ax in axes:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def plot_training_history(history: Dict[str, list], out_path: str) -> None:
    plt = _plt()
    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(12, 4))
    ax0.plot(history.get("loss", []))
    ax0.set_title("train loss")
    ax1.plot(history.get("iou", []), label="train IoU")
    if history.get("eval_iou"):
        ax1.axhline(history["eval_iou"][-1], color="r", ls="--",
                    label="eval IoU")
    ax1.legend()
    ax1.set_title("IoU")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
