"""Segmentation losses & metrics: dice + BCE (BASELINE.json config 2) and
IoU (the north-star parity metric)."""

from __future__ import annotations

import jax.numpy as jnp
import jax


def bce_with_logits(logits, labels, mask=None):
    """Mean binary cross-entropy over (optionally masked) pixels."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # numerically stable: max(l,0) - l*y + log1p(exp(-|l|))
    per_px = (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    if mask is not None:
        per_px = per_px * mask
        return jnp.sum(per_px) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(per_px)


def dice_loss(logits, labels, mask=None, eps: float = 1.0):
    """Soft dice loss (1 − dice coefficient), batch-pooled."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    labels = labels.astype(jnp.float32)
    if mask is not None:
        probs = probs * mask
        labels = labels * mask
    inter = jnp.sum(probs * labels)
    union = jnp.sum(probs) + jnp.sum(labels)
    return 1.0 - (2.0 * inter + eps) / (union + eps)


def dice_bce_loss(logits, labels, dice_weight: float = 0.5, mask=None,
                  label_smooth: float = 0.0):
    """Combined loss. ``label_smooth`` ε softens the BCE targets to
    ``y·(1−2ε)+ε`` — a weak-label noise hedge (the classical identify masks
    are imperfect; VERDICT round-1 weak #4). Dice keeps hard targets (its
    overlap semantics degrade under soft labels)."""
    bce_labels = labels
    if label_smooth:
        bce_labels = labels * (1.0 - 2.0 * label_smooth) + label_smooth
    return (
        dice_weight * dice_loss(logits, labels, mask)
        + (1.0 - dice_weight) * bce_with_logits(logits, bce_labels, mask)
    )


def iou(pred_mask, true_mask, eps: float = 1e-8):
    """Intersection-over-union of boolean masks (any matching shapes)."""
    pred = pred_mask.astype(jnp.float32)
    true = true_mask.astype(jnp.float32)
    inter = jnp.sum(pred * true)
    union = jnp.sum(jnp.maximum(pred, true))
    return (inter + eps) / (union + eps)
