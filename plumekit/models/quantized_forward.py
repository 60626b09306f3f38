"""Int8 post-training-quantized inference (weights AND activations) for
both architecture families — U-Net and UNet++ (incl. deep supervision).

The reference promises production plume segmentation but ships no model
(``src/models/`` is empty — reference ``README.md:41-45``); plumekit's
serving path adds the standard deployment lever the TPU hardware offers:
the v5e MXU runs s8×s8→s32 at twice its bf16 rate, so a fully int8
forward raises the compute ceiling of the dispatch-amortised inference
program (BASELINE.md round 3: 230 MPix/s/chip compute-bound at bf16).

Scheme — symmetric int8, the scale algebra chosen so every tensor is
rounded exactly once:

* **Activations**: per-tensor symmetric scales, calibrated offline as
  ``amax/127`` over a calibration batch run through the fp32 replay
  (:func:`calibrate_unet`). ReLU outputs and the raw input quantize at
  their own recorded range; SAME-padding zeros are exact (0 ↔ 0).
* **Weights**: per-OUTPUT-channel symmetric int8 — with each input
  channel's activation scale folded into the weight column *first*
  (``W'[..,c,o] = W[..,c,o]·s_x[c]``). Folding input scales into weights
  is what makes concatenations free: the decoder's ``concat([skip, up])``
  halves keep their own scales and the conv weight slices absorb them, so
  neither half is ever re-quantized (no double rounding anywhere).
* **BatchNorm** folds into the per-channel dequant multiplier: one fused
  elementwise ``relu(acc·a + b)`` carries conv-scale × BN-scale and the
  BN shift; XLA fuses it into the convolution epilogue.
* **Max-pool** runs directly on int8 (monotone — pooling then scaling
  equals scaling then pooling), so encoder levels hand pooled int8
  straight to the next conv with no round trip.
* The 1×1 ``head`` stays fp32 (negligible FLOPs, full logit precision).

Accuracy contract: tested against the fp32 forward as a *mask* parity
bound on trained weights (see ``tests/test_quantized_forward.py``) — the
measured mask-flip rate sits in the same band as the documented stitching
seam cost (docs/performance.md), i.e. int8 is not the dominant error
source of the serving pipeline.

Usage::

    qvars = quantize_unet(variables, cfg, calib_batch)
    apply = make_quantized_apply(cfg)          # (qvars, tiles) -> logits
    infer = make_sliding_infer(apply, icfg)    # drop-in apply_fn
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax import lax

from plumekit.config.train import UNetConfig
from plumekit.models.pallas.fused_conv import fold_batchnorm
from plumekit.models.unetpp import effective_level

_DN = ("NHWC", "HWIO", "NHWC")


def _with_fold_vmap(raw_apply):
    """Wrap a batch-oblivious ``apply(qvars, x) -> y`` so ``jax.vmap`` folds
    the mapped axis into the tile-batch dim instead of batching every
    primitive.

    Measured motivation (experiments/int8_vmap_probe.py, TPU v5e): the int8
    forward runs 517.6 MPix/s on a flat 256-tile batch but only 176.5 under
    ``vmap`` over a granule axis — XLA's default batching of the s8 ops
    (the int32 upsample einsum, int8 concats/requants) loses the MXU int8
    path's 1.6×-over-bf16 win and lands BELOW bf16 (whose vmap is free,
    315.9 both ways). ``make_multi_granule_infer`` and the sharded config-5
    program are exactly ``vmap(sliding_infer)``, so without this rule the
    dispatch-amortised int8 bench measured 0.55× bf16 end-to-end.

    Folding is exact: the forward is per-sample, so reshaping (G, B, ...)
    to (G·B, ...) and back is the identity on values (CPU-verified
    bit-equal in tests/test_quantized_forward.py). The rule re-enters the
    wrapped function so nested vmaps keep folding.
    """
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def folded(qvars, x):
        return raw_apply(qvars, x)

    @folded.def_vmap
    def _rule(axis_size, in_batched, qvars, x):
        qvars_batched, x_batched = in_batched
        if any(jax.tree_util.tree_leaves(qvars_batched)):
            raise NotImplementedError(
                "int8 quantized apply: vmap over the quantized variables "
                "is not supported (serving replicates them)")
        if not x_batched:
            return folded(qvars, x), False
        lead, b = x.shape[0], x.shape[1]
        y = folded(qvars, x.reshape((lead * b,) + x.shape[2:]))
        return y.reshape((lead, b) + y.shape[1:]), True

    return folded


def _check_cfg(cfg: UNetConfig) -> None:
    if cfg.arch not in ("unet", "unetpp"):
        raise ValueError(
            f"int8 quantized forward supports arch 'unet' or 'unetpp', "
            f"got {cfg.arch!r}")
    if cfg.norm != "batch":
        raise ValueError("int8 quantized forward requires norm='batch' "
                         "(BN folds into the dequant multiplier)")
    effective_level(cfg)  # validate prune_level against arch/ds/depth


def _amax(x) -> jnp.ndarray:
    return jnp.maximum(jnp.abs(x).max(), 1e-8).astype(jnp.float32)


def _quant_act(x, scale):
    """fp → symmetric int8 at per-tensor ``scale`` (value ≈ q·scale)."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _quant_weight(w, in_scales):
    """Per-output-channel int8 with input activation scales folded in.

    ``w`` (kh, kw, cin, cout) fp32; ``in_scales`` (cin,). Returns
    ``(wq int8, sw (cout,) fp32)`` with
    ``conv_fp(x, w) ≈ conv_s8(xq, wq) · sw`` for ``x ≈ xq·s_x``."""
    wp = w.astype(jnp.float32) * in_scales[None, None, :, None]
    sw = jnp.maximum(jnp.abs(wp).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wp / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def _qconv(xq, wq):
    """SAME 3×3 (or 1×1) s8×s8→s32 conv — lowers onto the MXU int8 path."""
    return lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32)


def _max_pool2_q(xq):
    b, h, w, c = xq.shape
    return xq.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _upsample_q(xq, kq, sw, bias):
    """2×2 stride-2 transposed conv in int8: one s8 einsum + pixel shuffle
    (the fused_forward matmul formulation; kernel pre-flipped at quantize
    time so the hot path is a single contraction)."""
    b, h, w, _cin = xq.shape
    cout = kq.shape[-1]
    acc = jnp.einsum("bhwc,ijco->bhwijo", xq, kq,
                     preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sw + bias
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)


def _conv_bn_relu(x, w, a, b):
    """fp32 oracle tap used by the calibration replays."""
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.float32)
    return jnp.maximum(y * a + b, 0.0)


def _qblock(xq, blk):
    """Int8 DoubleConv: qconv → fused dequant+BN+ReLU → requant → qconv →
    fused epilogue. Returns the fp32 block output (callers requant at the
    block's own output scale, or feed it to an fp head)."""
    y = _qconv(xq, blk["wq1"]).astype(jnp.float32)
    y = jnp.maximum(y * blk["a1"] + blk["b1"], 0.0)
    mq = _quant_act(y, blk["s_mid"])
    y = _qconv(mq, blk["wq2"]).astype(jnp.float32)
    return jnp.maximum(y * blk["a2"] + blk["b2"], 0.0)


def _folded_block(params, stats):
    """(w1, a_bn1, b1, w2, a_bn2, b2) for one DoubleConv — fp32, BN folded."""
    out = []
    for j in (0, 1):
        bn_p = params[f"_Norm_{j}"]["BatchNorm_0"]
        bn_s = stats[f"_Norm_{j}"]["BatchNorm_0"]
        scale, shift = fold_batchnorm(bn_p["scale"], bn_p["bias"],
                                      bn_s["mean"], bn_s["var"])
        out.append((params[f"Conv_{j}"]["kernel"].astype(jnp.float32),
                    scale.astype(jnp.float32), shift.astype(jnp.float32)))
    return out


def calibrate_unet(variables, cfg: UNetConfig, calib) -> Dict[str, Any]:
    """Record per-tensor |max| at every quantization point by replaying the
    BN-folded fp32 forward on ``calib`` (B, H, W, C), H/W divisible by
    ``2**cfg.depth``. Returns ``{name: amax}`` with names:

    * ``in`` — the raw input;
    * ``b{i}_mid`` — block *i*'s first ReLU output (second conv's input);
    * ``b{i}_out`` — block *i*'s output, for every block except the last
      decoder block (whose output feeds the fp32 head). One scale per
      encoder output serves BOTH its consumers (pool→next block and the
      decoder concat), so the tensor is quantized once;
    * ``up{u}`` — transposed-conv *u*'s output (the concat's second half).

    NOTE: the replay is eager and materializes full-resolution fp32
    activations of every level, so calibrate on a BATCH OF TILES, not a
    whole large granule — scales are per-tensor maxima, so a tile grid
    covering the granule records the same ranges at a fraction of the
    memory (the predict CLI samples a 3×3 tile grid).
    """
    _check_cfg(cfg)
    if cfg.arch == "unetpp":
        return _calibrate_unetpp(variables, cfg, calib)
    params, stats = variables["params"], variables["batch_stats"]
    depth = cfg.depth
    amax: Dict[str, Any] = {}

    conv_bn_relu = _conv_bn_relu

    x = jnp.asarray(calib, jnp.float32)
    amax["in"] = _amax(x)
    skips: List[Any] = []
    idx = 0
    for _ in range(depth):
        (w1, a1, b1), (w2, a2, b2) = _folded_block(
            params[f"DoubleConv_{idx}"], stats[f"DoubleConv_{idx}"])
        x = conv_bn_relu(x, w1, a1, b1)
        amax[f"b{idx}_mid"] = _amax(x)
        x = conv_bn_relu(x, w2, a2, b2)
        amax[f"b{idx}_out"] = _amax(x)
        skips.append(x)
        b_, h, w_, c = x.shape
        x = x.reshape(b_, h // 2, 2, w_ // 2, 2, c).max(axis=(2, 4))
        idx += 1
    (w1, a1, b1), (w2, a2, b2) = _folded_block(
        params[f"DoubleConv_{idx}"], stats[f"DoubleConv_{idx}"])
    x = conv_bn_relu(x, w1, a1, b1)
    amax[f"b{idx}_mid"] = _amax(x)
    x = conv_bn_relu(x, w2, a2, b2)
    amax[f"b{idx}_out"] = _amax(x)
    idx += 1

    for u, skip in enumerate(reversed(skips)):
        ct = params[f"ConvTranspose_{u}"]
        k = ct["kernel"].astype(jnp.float32)
        b_, h, w_, _ = x.shape
        cout = k.shape[-1]
        y = jnp.einsum("bhwc,ijco->bhwijo", x, k[::-1, ::-1])
        x = (y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * w_, cout)
             + ct["bias"].astype(jnp.float32))
        amax[f"up{u}"] = _amax(x)
        x = jnp.concatenate([skip, x], axis=-1)
        (w1, a1, b1), (w2, a2, b2) = _folded_block(
            params[f"DoubleConv_{idx}"], stats[f"DoubleConv_{idx}"])
        x = conv_bn_relu(x, w1, a1, b1)
        amax[f"b{idx}_mid"] = _amax(x)
        x = conv_bn_relu(x, w2, a2, b2)
        if idx != 2 * depth:  # last decoder output stays fp32 for the head
            amax[f"b{idx}_out"] = _amax(x)
        idx += 1
    return amax


def quantize_unet(variables, cfg: UNetConfig, calib) -> Dict[str, Any]:
    """Build the int8 serving variables from trained fp32 ``variables``
    (params + batch_stats, the exact tree :class:`plumekit.models.UNet`
    produces) and a calibration batch. Pure preprocessing — runs once,
    off the serving hot path."""
    _check_cfg(cfg)
    if cfg.arch == "unetpp":
        return _quantize_unetpp(variables, cfg, calib)
    amax = calibrate_unet(variables, cfg, calib)
    s = {k: v / 127.0 for k, v in amax.items()}
    params, stats = variables["params"], variables["batch_stats"]
    depth = cfg.depth

    def cin_of(w):
        return w.shape[2]

    blocks = []
    idx = 0
    in_name = "in"
    for _ in range(depth + 1):  # encoder levels + bottleneck
        (w1, a1, b1), (w2, a2, b2) = _folded_block(
            params[f"DoubleConv_{idx}"], stats[f"DoubleConv_{idx}"])
        s_in = s[in_name] * jnp.ones((cin_of(w1),), jnp.float32)
        wq1, sw1 = _quant_weight(w1, s_in)
        s_mid = s[f"b{idx}_mid"] * jnp.ones((cin_of(w2),), jnp.float32)
        wq2, sw2 = _quant_weight(w2, s_mid)
        blocks.append({
            "wq1": wq1, "a1": sw1 * a1, "b1": b1,
            "s_mid": s[f"b{idx}_mid"],
            "wq2": wq2, "a2": sw2 * a2, "b2": b2,
            "s_out": s[f"b{idx}_out"],
        })
        in_name = f"b{idx}_out"
        idx += 1

    ups = []
    for u in range(depth):
        ct = params[f"ConvTranspose_{u}"]
        k = ct["kernel"].astype(jnp.float32)[::-1, ::-1]  # pre-flip
        src = f"b{depth + u}_out"  # u=0 reads the bottleneck output
        s_in = s[src] * jnp.ones((k.shape[2],), jnp.float32)
        kq, sw = _quant_weight(k, s_in)
        ups.append({"kq": kq, "sw": sw,
                    "bias": ct["bias"].astype(jnp.float32),
                    "s_up": s[f"up{u}"]})

        # decoder block u = DoubleConv_{depth+1+u}: conv1 input is
        # concat([skip (enc level depth-1-u), up u]) — each half keeps its
        # own scale, folded into the matching weight slice
        blk = f"DoubleConv_{depth + 1 + u}"
        (w1, a1, b1), (w2, a2, b2) = _folded_block(params[blk], stats[blk])
        c_skip = params[f"DoubleConv_{depth - 1 - u}"]["Conv_1"][
            "kernel"].shape[-1]
        c_up = k.shape[-1]
        s_cat = jnp.concatenate([
            s[f"b{depth - 1 - u}_out"] * jnp.ones((c_skip,), jnp.float32),
            s[f"up{u}"] * jnp.ones((c_up,), jnp.float32)])
        wq1, sw1 = _quant_weight(w1, s_cat)
        s_mid = (s[f"b{depth + 1 + u}_mid"]
                 * jnp.ones((cin_of(w2),), jnp.float32))
        wq2, sw2 = _quant_weight(w2, s_mid)
        last = (depth + 1 + u) == 2 * depth
        blocks.append({
            "wq1": wq1, "a1": sw1 * a1, "b1": b1,
            "s_mid": s[f"b{depth + 1 + u}_mid"],
            "wq2": wq2, "a2": sw2 * a2, "b2": b2,
            # the last decoder output feeds the fp32 head un-quantized
            "s_out": None if last else s[f"b{depth + 1 + u}_out"],
        })

    head = params["head"]
    return {
        "s_in": s["in"],
        "blocks": blocks,
        "ups": ups,
        "head": {"kernel": head["kernel"].astype(jnp.float32),
                 "bias": head["bias"].astype(jnp.float32)},
    }


def make_quantized_apply(cfg: UNetConfig):
    """Returns ``apply(qvars, x, train=False) -> logits (B, H, W, out)`` —
    the int8 twin of ``UNet.apply``, drop-in as ``make_sliding_infer``'s
    ``apply_fn``. Every conv and transposed conv contracts in s8×s8→s32;
    the only fp32 work is the fused dequant+BN+ReLU epilogues and the 1×1
    head."""
    _check_cfg(cfg)
    if cfg.arch == "unetpp":
        return _make_unetpp_apply(cfg)
    depth = cfg.depth

    qblock = _qblock

    def raw_apply(qvars, x):
        xq = _quant_act(x.astype(jnp.float32), qvars["s_in"])
        skips = []
        for i in range(depth):
            blk = qvars["blocks"][i]
            y = qblock(xq, blk)
            oq = _quant_act(y, blk["s_out"])
            skips.append(oq)
            xq = _max_pool2_q(oq)
        blk = qvars["blocks"][depth]
        y = qblock(xq, blk)
        xq = _quant_act(y, blk["s_out"])

        for u, skip in enumerate(reversed(skips)):
            up = qvars["ups"][u]
            y = _upsample_q(xq, up["kq"], up["sw"], up["bias"])
            uq = _quant_act(y, up["s_up"])
            blk = qvars["blocks"][depth + 1 + u]
            y = qblock(jnp.concatenate([skip, uq], axis=-1), blk)
            if blk["s_out"] is not None:
                xq = _quant_act(y, blk["s_out"])
        head = qvars["head"]
        logits = (jnp.einsum("bhwc,co->bhwo", y, head["kernel"][0, 0])
                  + head["bias"])
        return logits

    folded = _with_fold_vmap(raw_apply)

    def apply(qvars, x, train: bool = False):
        if train:
            raise ValueError("int8 quantized forward is inference-only")
        return folded(qvars, x)

    return apply


# ---------------------------------------------------------------------------
# UNet++ (models/unetpp.py): same scale algebra over the nested dense grid.
# Node X[i][j] (scale 1/2^i, fusion column j) consumes
# concat(X[i][0..j-1], up(X[i+1][j-1])) — every concat participant keeps
# its OWN per-tensor scale and the conv-1 weight slices absorb them, so the
# multi-way concats quantize exactly once, like the U-Net's two-way ones.
# Tensor names: "in", "x{i}_{j}_mid", "x{i}_{j}_out", "up{i}_{j}". Heads
# stay fp32 and read the PRE-quantization block outputs (matching flax,
# where heads cast the node itself); only X[0][depth] is head-only, so it
# never quantizes its output.
# ---------------------------------------------------------------------------


def _calibrate_unetpp(variables, cfg: UNetConfig, calib) -> Dict[str, Any]:
    params, stats = variables["params"], variables["batch_stats"]
    depth = effective_level(cfg)  # prune_level truncates the grid
    amax: Dict[str, Any] = {}

    x = jnp.asarray(calib, jnp.float32)
    amax["in"] = _amax(x)

    grid = {}
    h = x
    for i in range(depth + 1):
        if i:
            b_, hh, ww, c = h.shape
            h = h.reshape(b_, hh // 2, 2, ww // 2, 2, c).max(axis=(2, 4))
        name = f"x_{i}_0"
        (w1, a1, b1), (w2, a2, b2) = _folded_block(params[name],
                                                   stats[name])
        h = _conv_bn_relu(h, w1, a1, b1)
        amax[f"x{i}_0_mid"] = _amax(h)
        h = _conv_bn_relu(h, w2, a2, b2)
        if (i, 0) != (0, depth):
            amax[f"x{i}_0_out"] = _amax(h)
        grid[(i, 0)] = h

    for j in range(1, depth + 1):
        for i in range(depth + 1 - j):
            ct = params[f"up_{i}_{j}"]
            k = ct["kernel"].astype(jnp.float32)
            src = grid[(i + 1, j - 1)]
            b_, hh, ww, _ = src.shape
            cout = k.shape[-1]
            y = jnp.einsum("bhwc,ijco->bhwijo", src, k[::-1, ::-1])
            up = (y.transpose(0, 1, 3, 2, 4, 5)
                  .reshape(b_, 2 * hh, 2 * ww, cout)
                  + ct["bias"].astype(jnp.float32))
            amax[f"up{i}_{j}"] = _amax(up)
            cat = jnp.concatenate(
                [grid[(i, k_)] for k_ in range(j)] + [up], axis=-1)
            name = f"x_{i}_{j}"
            (w1, a1, b1), (w2, a2, b2) = _folded_block(params[name],
                                                       stats[name])
            h = _conv_bn_relu(cat, w1, a1, b1)
            amax[f"x{i}_{j}_mid"] = _amax(h)
            h = _conv_bn_relu(h, w2, a2, b2)
            if (i, j) != (0, depth):
                amax[f"x{i}_{j}_out"] = _amax(h)
            grid[(i, j)] = h
    return amax


def _quantize_unetpp(variables, cfg: UNetConfig, calib) -> Dict[str, Any]:
    amax = _calibrate_unetpp(variables, cfg, calib)
    s = {k: v / 127.0 for k, v in amax.items()}
    params, stats = variables["params"], variables["batch_stats"]
    depth = effective_level(cfg)  # prune_level truncates the grid

    def quant_block(name, in_scales):
        (w1, a1, b1), (w2, a2, b2) = _folded_block(params[name],
                                                   stats[name])
        wq1, sw1 = _quant_weight(w1, in_scales)
        i, j = name.split("_")[1:]
        s_mid = s[f"x{i}_{j}_mid"] * jnp.ones((w2.shape[2],), jnp.float32)
        wq2, sw2 = _quant_weight(w2, s_mid)
        last = (int(i), int(j)) == (0, depth)
        return {"wq1": wq1, "a1": sw1 * a1, "b1": b1,
                "s_mid": s[f"x{i}_{j}_mid"],
                "wq2": wq2, "a2": sw2 * a2, "b2": b2,
                "s_out": None if last else s[f"x{i}_{j}_out"]}

    feats = [cfg.base_features * (1 << i) for i in range(depth + 1)]
    blocks: Dict[str, Any] = {}
    ups: Dict[str, Any] = {}
    for i in range(depth + 1):
        s_in = (s["in"] if i == 0 else s[f"x{i - 1}_0_out"])
        cin = cfg.in_channels if i == 0 else feats[i - 1]
        blocks[f"x{i}_0"] = quant_block(
            f"x_{i}_0", s_in * jnp.ones((cin,), jnp.float32))
    for j in range(1, depth + 1):
        for i in range(depth + 1 - j):
            ct = params[f"up_{i}_{j}"]
            k = ct["kernel"].astype(jnp.float32)[::-1, ::-1]  # pre-flip
            s_src = s[f"x{i + 1}_{j - 1}_out"]
            kq, sw = _quant_weight(
                k, s_src * jnp.ones((k.shape[2],), jnp.float32))
            ups[f"up{i}_{j}"] = {
                "kq": kq, "sw": sw,
                "bias": ct["bias"].astype(jnp.float32),
                "s_up": s[f"up{i}_{j}"]}
            s_cat = jnp.concatenate(
                [s[f"x{i}_{k_}_out"] * jnp.ones((feats[i],), jnp.float32)
                 for k_ in range(j)]
                + [s[f"up{i}_{j}"] * jnp.ones((feats[i],), jnp.float32)])
            blocks[f"x{i}_{j}"] = quant_block(f"x_{i}_{j}", s_cat)

    heads = {}
    if cfg.deep_supervision:
        for j in range(1, depth + 1):
            hp = params[f"head_{j}"]
            heads[f"head_{j}"] = {
                "kernel": hp["kernel"].astype(jnp.float32),
                "bias": hp["bias"].astype(jnp.float32)}
    else:
        hp = params["head"]
        heads["head"] = {"kernel": hp["kernel"].astype(jnp.float32),
                         "bias": hp["bias"].astype(jnp.float32)}
    return {"s_in": s["in"], "blocks": blocks, "ups": ups, "heads": heads}


def _make_unetpp_apply(cfg: UNetConfig):
    depth = effective_level(cfg)  # prune_level truncates the grid

    def head(y, hp):
        return (jnp.einsum("bhwc,co->bhwo", y, hp["kernel"][0, 0])
                + hp["bias"])

    def raw_apply(qvars, x):
        xq = _quant_act(x.astype(jnp.float32), qvars["s_in"])
        gridq = {}
        top_fp = {}
        h = xq
        for i in range(depth + 1):
            if i:
                h = _max_pool2_q(gridq[(i - 1, 0)])
            blk = qvars["blocks"][f"x{i}_0"]
            y = _qblock(h, blk)
            if blk["s_out"] is not None:
                gridq[(i, 0)] = _quant_act(y, blk["s_out"])
        for j in range(1, depth + 1):
            for i in range(depth + 1 - j):
                up = qvars["ups"][f"up{i}_{j}"]
                y = _upsample_q(gridq[(i + 1, j - 1)], up["kq"], up["sw"],
                                up["bias"])
                uq = _quant_act(y, up["s_up"])
                blk = qvars["blocks"][f"x{i}_{j}"]
                catq = jnp.concatenate(
                    [gridq[(i, k_)] for k_ in range(j)] + [uq], axis=-1)
                y = _qblock(catq, blk)
                if blk["s_out"] is not None:
                    gridq[(i, j)] = _quant_act(y, blk["s_out"])
                if i == 0:
                    top_fp[j] = y
        if cfg.deep_supervision:
            outs = [head(top_fp[j], qvars["heads"][f"head_{j}"])
                    for j in range(1, depth + 1)]
            return sum(outs) / len(outs)
        return head(top_fp[depth], qvars["heads"]["head"])

    folded = _with_fold_vmap(raw_apply)

    def apply(qvars, x, train: bool = False):
        if train:
            raise ValueError("int8 quantized forward is inference-only")
        return folded(qvars, x)

    return apply
