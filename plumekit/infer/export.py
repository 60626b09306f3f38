"""AOT model export — a portable serving artifact via ``jax.export``.

The reference promised a deployable model (``README.md:41-45``:
``predict_model`` consuming ``models/``) but shipped neither; plumekit's
live path re-traces the U-Net from Python on every process start. For
production serving that is a liability: the serving host must carry the
model code, the exact flax/plumekit versions, and pay a fresh trace +
compile. ``jax.export`` is the TPU-native answer: lower the ENTIRE jitted
inference program (sliding-window forward + overlap-blend stitching, or the
multi-granule vmapped variant) to StableHLO once, serialize it, and serve
the artifact anywhere a JAX runtime exists — no model code, no flax, no
re-trace; XLA recompiles the portable bytecode for the local chip.

Artifact layout (a directory)::

    program.stablehlo   serialized jax.export.Exported bytes
    meta.json           shapes, tile/overlap geometry, platforms, versions

Parameters are deliberately NOT baked into the program: the exported
function takes ``(variables, image)`` like the live path, so one artifact
serves every checkpoint of the architecture (restore via orbax as usual).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from plumekit.utils import get_logger

logger = get_logger(__name__)

_PROGRAM = "program.stablehlo"
_META = "meta.json"
#: highest artifact format version this reader supports. fp artifacts
#: stay at 1 (older readers keep accepting them); int8 artifacts write 2
#: because meta["forward"] CHANGES THE CALLING CONVENTION (the variables
#: argument is the quantized serving tree) — a pre-int8 reader that
#: ignored the key would feed fp params into the program and die on an
#: opaque pytree mismatch; the version gate turns that into the designed
#: "upgrade plumekit" error
FORMAT_VERSION = 2


def export_sliding_infer(
    variables,
    unet_cfg,
    infer_cfg,
    granule_hw: Tuple[int, int],
    granules: int = 1,
    platforms: Sequence[str] = ("tpu", "cpu"),
    forward: str = "flax",
    tta: bool = False,
):
    """Lower the full inference program for a fixed granule geometry.

    ``granule_hw`` is the PADDED granule shape the program will accept
    (must be divisible by ``2**unet_cfg.depth`` — the shape
    :func:`plumekit.infer.sliding.pad_to_multiple` produces);
    ``granules > 1`` exports the multi-granule one-dispatch variant
    (BASELINE.md round 3: the headline 230 MPix/s shape). ``platforms``
    defaults to a multi-platform artifact: export once on any host, serve
    on TPU or CPU.

    ``forward="int8"`` exports the post-training-quantized program
    (:mod:`plumekit.models.quantized_forward`): its variables argument is
    the int8 serving tree (``quantize_unet`` output), so the serving host
    quantizes each restored checkpoint at load time — the artifact stays
    checkpoint-agnostic exactly like the fp path. Recorded in
    ``meta["forward"]`` so ``predict_model --exported`` self-configures.

    Returns ``(jax.export.Exported, meta dict)``.
    """
    import jax
    from jax import export as jexport

    from plumekit.infer.sliding import (make_multi_granule_infer,
                                        make_sliding_infer)
    from plumekit.models import build_model

    h, w = granule_hw
    div = 2 ** unet_cfg.depth
    if h % div or w % div:
        raise ValueError(
            f"granule shape {granule_hw} must be divisible by 2**depth "
            f"({div}); pad with plumekit.infer.sliding.pad_to_multiple")

    if forward == "int8":
        from plumekit.models.quantized_forward import (make_quantized_apply,
                                                       quantize_unet)

        # only the qvars tree STRUCTURE enters the export (shapes/dtypes);
        # a unit-range dummy batch gives well-defined scale values that the
        # serving host replaces with its own calibrated tree
        calib = np.random.default_rng(0).random(
            (1, infer_cfg.tile_size, infer_cfg.tile_size,
             unet_cfg.in_channels)).astype(np.float32)
        variables = quantize_unet(variables, unet_cfg, calib)
        apply_fn = make_quantized_apply(unet_cfg)
    elif forward == "flax":
        apply_fn = build_model(unet_cfg).apply
    else:
        raise ValueError(f"forward must be 'flax' or 'int8', got {forward!r}")
    if tta:
        # D4-averaged forward baked into the artifact (calling convention
        # unchanged — TTA is a pure apply wrapper); see plumekit.infer.tta
        from plumekit.infer.tta import make_tta_apply

        apply_fn = make_tta_apply(apply_fn)

    if granules > 1:
        fn = make_multi_granule_infer(apply_fn, infer_cfg,
                                      channels=unet_cfg.in_channels)
        image_spec = jax.ShapeDtypeStruct(
            (granules, h, w, unet_cfg.in_channels), np.float32)
    else:
        fn = make_sliding_infer(apply_fn, infer_cfg,
                                channels=unet_cfg.in_channels)
        image_spec = jax.ShapeDtypeStruct((h, w, unet_cfg.in_channels),
                                          np.float32)

    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        variables)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(
        var_specs, image_spec)

    meta = {
        "forward": forward,
        "tta": bool(tta),              # informational: baked into the program
        "format_version": 2 if forward == "int8" else 1,
        "granule_hw": [int(h), int(w)],
        "granules": int(granules),
        "in_channels": int(unet_cfg.in_channels),
        "depth": int(unet_cfg.depth),
        # informational: the program itself is already truncated when set
        "prune_level": (None if unet_cfg.prune_level is None
                        else int(unet_cfg.prune_level)),
        "tile_size": int(infer_cfg.tile_size),
        "overlap": int(infer_cfg.overlap),
        "batch_tiles": int(infer_cfg.batch_tiles),
        "threshold": float(infer_cfg.threshold),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    return exported, meta


def save_exported(exported, meta: dict, out_dir: str) -> str:
    """Write the artifact directory; returns ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    logger.info("exported %d-byte program -> %s", len(blob), out_dir)
    return out_dir


def load_exported(artifact_dir: str):
    """Load an artifact: returns ``(infer_fn, meta)`` where
    ``infer_fn(variables, image) -> (probs, masks)`` executes the
    deserialized program on the current backend (jit-compatible — it may be
    called from inside another jitted function, e.g. the streaming
    dequant wrapper)."""
    from jax import export as jexport

    with open(os.path.join(artifact_dir, _PROGRAM), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(artifact_dir, _META)) as f:
        meta = json.load(f)
    if meta.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"artifact {artifact_dir} has format_version "
            f"{meta['format_version']} > supported {FORMAT_VERSION}; "
            "upgrade plumekit")
    import jax

    backend = jax.default_backend().lower()
    plats = [p.lower() for p in meta.get("platforms", [])]
    if plats and backend not in plats:
        # fail at load, not deep inside the first streamed batch, with the
        # remedy in the message (exported.call re-checks authoritatively)
        raise ValueError(
            f"artifact {artifact_dir} was exported for platforms {plats} "
            f"but the current backend is '{backend}'; re-export with "
            f"export_model --platforms {backend} (or 'tpu,cpu' for a "
            "portable artifact)")

    expected_hw = tuple(meta["granule_hw"])
    granules = int(meta.get("granules", 1))
    channels = int(meta["in_channels"])
    want = ((granules,) + expected_hw + (channels,) if granules > 1
            else expected_hw + (channels,))

    def infer_fn(variables, image):
        if tuple(np.shape(image)) != want:
            raise ValueError(
                f"exported program expects image shape {want} "
                f"(granule {expected_hw}, G={granules}; pad with "
                f"pad_to_multiple(2**{meta['depth']})), got "
                f"{tuple(np.shape(image))}")
        return exported.call(variables, image)

    return infer_fn, meta


def is_artifact(path: Optional[str]) -> bool:
    return bool(path) and os.path.isfile(os.path.join(path, _PROGRAM))
