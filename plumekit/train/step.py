"""The jitted train/eval steps with data-parallel sharding.

TPU-first (SURVEY.md §2.2): no NCCL-style explicit collectives — the step is
jit-compiled over a ``jax.sharding.Mesh`` with the batch sharded on the
``data`` axis and parameters replicated; XLA/GSPMD inserts the grad
all-reduce over ICI. BatchNorm statistics reduce over the *global* batch for
the same reason (the batch mean is a cross-shard reduction under GSPMD).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plumekit.models.losses import dice_bce_loss, iou
from plumekit.train.augment import augment_batch
from plumekit.train.state import TrainState


def _make_step_core(dice_weight: float, augment: bool, label_smooth: float):
    """The un-jitted step body shared by the single-step and scanned
    multi-step variants."""

    def step(state: TrainState, xs, ys, rng):
        if augment:
            xs, ys = augment_batch(rng, xs, ys)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                logits, updates = state.apply_fn(
                    variables, xs, train=True, mutable=["batch_stats"]
                )
                new_stats = updates["batch_stats"]
            else:
                logits = state.apply_fn(variables, xs, train=True)
                new_stats = None
            loss = dice_bce_loss(logits, ys, dice_weight,
                                 label_smooth=label_smooth)
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "iou": iou(jax.nn.sigmoid(logits) > 0.5, ys > 0.5),
        }
        return state, metrics

    return step


def _dequant_batch(batch):
    """Decode a quantized tile batch INSIDE the jitted program: ``(q
    uint16, lo (..., C), scale (..., C), y8 uint8) -> (xs, ys) float32``.
    The ellipsis covers the optional leading steps axis of the scanned
    multi-step variant (lo/scale broadcast over the two spatial dims).
    Uses the SHARED codec (``ops/quant.dequantize``) so the train decode
    can never drift from the streaming-inference decode."""
    import jax.numpy as jnp

    from plumekit.ops.quant import dequantize

    q, lo, scale, y8 = batch
    xs = dequantize(q, lo[..., None, None, :], scale[..., None, None, :])
    # masks encode as uint8/255 (exact for {0, 1} labels; soft distilled
    # labels round-trip to 1/510) — see quantize_samples
    return xs, y8.astype(jnp.float32) * (1.0 / 255.0)


def make_train_step(dice_weight: float = 0.5, augment: bool = True,
                    mesh: Optional[Mesh] = None, label_smooth: float = 0.0,
                    dequant: bool = False):
    """Returns ``step(state, xs, ys, rng) -> (state, metrics)``.

    With a mesh, inputs are expected batch-sharded over ``data`` (see
    :func:`shard_batch`); without one, it is a plain single-device jit.
    With ``dequant``, the signature becomes ``step(state, (q, lo, scale,
    y8), rng)`` — the quantized-transfer path (``TrainConfig.
    quantize_transfer``): tiles cross the host→device hop as uint16/uint8
    (4 B/px instead of 12 on the measured transfer-bound platform) and are
    decoded as the program's first op, before augmentation.
    """
    core = _make_step_core(dice_weight, augment, label_smooth)
    if dequant:
        def step(state, batch, rng):
            xs, ys = _dequant_batch(batch)
            return core(state, xs, ys, rng)
    else:
        step = core

    if mesh is not None:
        ds = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        batch_sh = (ds, ds, ds, ds) if dequant else ds
        return jax.jit(
            step,
            in_shardings=((replicated, batch_sh, replicated) if dequant
                          else (replicated, ds, ds, replicated)),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


def make_multi_train_step(dice_weight: float = 0.5, augment: bool = True,
                          mesh: Optional[Mesh] = None,
                          label_smooth: float = 0.0, base_rng=None,
                          dequant: bool = False):
    """Returns ``multi(state, xs (K, B, ...), ys (K, B, ...), steps (K,))
    -> (state, last_metrics)`` — K optimizer steps scanned inside ONE
    dispatched program.

    On the tunneled platform a fixed ~45 ms dispatch latency rides on every
    program call, which is comparable to the step itself at config-2 scale;
    scanning K steps amortises it (the same lever that took inference from
    108 to 230 MPix/s, BASELINE.md round 3). Semantics are identical to K
    calls of :func:`make_train_step`: per-step keys are folded from the
    GLOBAL step index inside the program (``fold_in(base_rng, step)``), so
    data order, augmentation draws, and resume determinism match the
    single-step path exactly (outputs agree to float tolerance — the
    scanned program may fuse reductions in a different order).
    """
    core = _make_step_core(dice_weight, augment, label_smooth)
    if base_rng is None:
        base_rng = jax.random.PRNGKey(0)

    if dequant:
        # signature: multi(state, (q (K,B,...), lo (K,B,C), scale, y8),
        # steps (K,)) — decode per scanned step so only the current step's
        # tiles are live in fp32
        def multi(state: TrainState, batch, steps):
            def body(st, args):
                b, s = args
                x, y = _dequant_batch(b)
                st, m = core(st, x, y, jax.random.fold_in(base_rng, s))
                return st, m

            state, ms = jax.lax.scan(body, state, (batch, steps))
            return state, jax.tree_util.tree_map(lambda a: a[-1], ms)
    else:
        def multi(state: TrainState, xs, ys, steps):
            def body(st, args):
                x, y, s = args
                st, m = core(st, x, y, jax.random.fold_in(base_rng, s))
                return st, m

            state, ms = jax.lax.scan(body, state, (xs, ys, steps))
            return state, jax.tree_util.tree_map(lambda a: a[-1], ms)

    if mesh is not None:
        ds = NamedSharding(mesh, P(None, "data"))
        replicated = NamedSharding(mesh, P())
        in_sh = ((replicated, (ds, ds, ds, ds), replicated) if dequant
                 else (replicated, ds, ds, replicated))
        return jax.jit(
            multi,
            in_shardings=in_sh,
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(dice_weight: float = 0.5):
    """``dice_weight`` must match the training objective — an eval loss
    computed with a different mix is not comparable to the train loss and
    would mislead any loss-based model selection."""
    def eval_step(state: TrainState, xs, ys):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits = state.apply_fn(variables, xs, train=False)
        return {
            "loss": dice_bce_loss(logits, ys, dice_weight=dice_weight),
            "iou": iou(jax.nn.sigmoid(logits) > 0.5, ys > 0.5),
        }

    return jax.jit(eval_step)


def shard_batch(mesh: Mesh, xs, ys):
    """Place a host batch onto the mesh, sharded over the ``data`` axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.device_put(xs, sh), jax.device_put(ys, sh)
