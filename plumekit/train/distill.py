"""Offline knowledge distillation: teacher soft labels for student training.

The round-3 architecture ladder left the framework with a quality/speed
split: UNet++ + deep supervision is the measured quality pick (GT-dev IoU
0.813 vs 0.736, BASELINE.md) but serves at ~1/3 the U-Net's int8
throughput (114.6 vs 324.8 MPix/s/chip — the dense nested decoder triples
per-pixel work at inference, where nothing hides it). Distillation closes
the split: train the expensive teacher once, re-label the training
granules with its soft probabilities, and train the fast student on the
blend — the teacher's FLOPs are paid offline, the serving body stays the
cheap one.

TPU-first design — OFFLINE, not in-step: the teacher forward runs ONCE
per granule through the already-amortised sliding-inference path (the
324.8 MPix/s program) instead of once per train step inside the step
program. Because binary cross-entropy is LINEAR in the target, blending
the label plane

    y_kd = alpha * p_teacher + (1 - alpha) * y_hard

makes the training loss exactly the classic mixed KD objective
``alpha * BCE(student, p_teacher) + (1 - alpha) * BCE(student, y_hard)``
with zero per-step cost and no change to the train step at all (the dice
term becomes soft dice against the blend, the same relaxation
``label_smooth`` already uses). Temperature rides the same path: the
teacher's logits are divided by T before the sliding infer's sigmoid, so
``p_teacher = sigmoid(logits / T)`` without a second canvas.

The reference has no model training at all (its ``train_model`` was
promised in README.md:41-45 and never written); this module is part of
plumekit's L4 extension, matching the reference only in spirit — produce
the best masks per compute.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import numpy as np

from plumekit.config.train import InferConfig, TrainConfig, UNetConfig
from plumekit.train.data import GranuleSample
from plumekit.utils import get_logger

logger = get_logger(__name__)


def load_teacher(ckpt_dir: str, prune_level: Optional[int] = None):
    """Restore a trained checkpoint as a serving (apply_fn, variables,
    cfg) triple. The restore template is always the FULL recorded config
    (checkpoints hold every param); ``prune_level`` truncates only the
    serving forward (UNet++ deep-supervision checkpoints — see
    ``models/unetpp.effective_level``)."""
    from plumekit.models import build_model
    from plumekit.train.checkpoint import (latest_step, load_model_config,
                                           restore_checkpoint)
    from plumekit.train.state import create_state

    cfg = load_model_config(ckpt_dir)
    if cfg is None:
        raise ValueError(
            f"no model_config.json under {ckpt_dir!r} — the teacher must "
            "be a plumekit checkpoint directory written by train_model")
    step = latest_step(ckpt_dir)
    if step is None:
        raise ValueError(f"no checkpoints under {ckpt_dir!r}")
    state = create_state(jax.random.PRNGKey(0), cfg, TrainConfig())
    state = restore_checkpoint(ckpt_dir, state, step)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    serve_cfg = cfg if prune_level is None else dataclasses.replace(
        cfg, prune_level=prune_level)
    logger.info("teacher: %s step %d (arch=%s ds=%s prune=%s)",
                ckpt_dir, step, cfg.arch, cfg.deep_supervision, prune_level)
    return build_model(serve_cfg).apply, variables, serve_cfg


def distill_samples(
    samples: List[GranuleSample],
    teacher_ckpt_dir: str,
    alpha: float = 0.7,
    temperature: float = 1.0,
    prune_level: Optional[int] = None,
    infer_cfg: Optional[InferConfig] = None,
    tta: bool = False,
    calibrate_threshold: Optional[float] = None,
) -> List[GranuleSample]:
    """Re-label granules with the teacher's soft probabilities blended into
    the existing labels: ``mask' = alpha * sigmoid(teacher_logits / T) +
    (1 - alpha) * mask``. ``alpha=1`` trains purely on the teacher,
    ``alpha=0`` is a no-op. Channels are untouched; the eval/dev set should
    NOT pass through here (dev IoU must stay measured against the original
    labels to be comparable across runs).

    Round-4 teacher-quality dials (VERDICT round-3 next #3):

    * ``tta`` — D4-average the teacher's probabilities (8 views folded
      into one forward, ``infer/tta.py``): the ensemble denoises the soft
      labels at one-time offline cost.
    * ``calibrate_threshold`` — recenter the teacher's logits so its
      CALIBRATED operating point t* maps to probability 0.5:
      ``p' = sigmoid((z − logit(t*)) / T)`` — recentred BEFORE tempering,
      so t* → 0.5 holds at every temperature (shifting after the divide
      would move the operating point to sigmoid(logit(t*)(1−T)/T) for
      T ≠ 1). The round-3 sweep showed the
      weak-label teacher's true operating point sits at ~0.70; without
      recentring the student inherits miscalibrated targets and has to
      re-learn the shift (it self-calibrates to ~0.60, BASELINE.md).
      Pass the value persisted by ``evaluate_model --write-threshold``.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"distill alpha must be in [0, 1], got {alpha}")
    if temperature <= 0.0:
        raise ValueError(f"distill temperature must be > 0, got "
                         f"{temperature}")
    if calibrate_threshold is not None and not 0.0 < calibrate_threshold < 1.0:
        raise ValueError(f"calibrate_threshold must be in (0, 1), got "
                         f"{calibrate_threshold}")
    if alpha == 0.0:
        # labels would come out identical — skip the teacher restore and
        # the full-granule inference pass entirely
        logger.warning("distill_alpha=0: labels unchanged, teacher at %s "
                       "not loaded", teacher_ckpt_dir)
        return list(samples)
    apply_fn, variables, cfg = load_teacher(teacher_ckpt_dir, prune_level)
    if samples and samples[0].channels.shape[-1] != cfg.in_channels:
        raise ValueError(
            f"teacher expects {cfg.in_channels} input channels, samples "
            f"have {samples[0].channels.shape[-1]}")

    shift = (0.0 if calibrate_threshold is None
             else float(np.log(calibrate_threshold
                               / (1.0 - calibrate_threshold))))
    if temperature != 1.0 or shift != 0.0:
        base_apply = apply_fn

        def apply_fn(v, x, train=False):      # noqa: F811
            # recenter, THEN temper: (z - logit(t*)) / T keeps the
            # calibrated operating point at 0.5 for every T
            return (base_apply(v, x, train=train) - shift) / temperature
    if tta:
        # D4-averaged teacher: wraps AFTER the shift so the ensemble
        # averages the recentred probabilities
        from plumekit.infer.tta import make_tta_apply

        apply_fn = make_tta_apply(apply_fn)

    from plumekit.infer import make_sliding_infer

    infer = make_sliding_infer(apply_fn, infer_cfg or InferConfig(),
                               channels=cfg.in_channels)
    out = []
    for i, s in enumerate(samples):
        import jax.numpy as jnp

        probs, _mask = infer(variables, jnp.asarray(s.channels))
        soft = np.asarray(probs, np.float32)
        blended = (alpha * soft
                   + (1.0 - alpha) * s.mask.astype(np.float32))
        ns = GranuleSample(channels=s.channels, mask=blended)
        out.append(ns)
    logger.info("distilled %d granules (alpha=%.2f T=%.2f tta=%s "
                "calibrate=%s)", len(out), alpha, temperature, tta,
                calibrate_threshold)
    return out


__all__ = ["distill_samples", "load_teacher"]
