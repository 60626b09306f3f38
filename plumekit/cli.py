"""Command-line entry points.

The reference README promises ``make_dataset`` / ``build_features`` /
``train_model`` / ``predict_model`` (``README.md:27-49``) but none exist on
disk (SURVEY.md §0). plumekit ships them, plus ``identify`` (the batch
drivers of ``plume_identifier_*.main()``) and ``select`` (the curation tool).

Usage: ``plumekit <command> [options]`` or ``python -m plumekit.cli ...``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional

import numpy as np

from plumekit.config import PathsConfig
from plumekit.utils import get_logger

#: calibrated serving threshold artifact under <root>/models/
#: (written by `evaluate_model --sweep-threshold ... --write-threshold`,
#: read automatically by predict/serve when --threshold is not given)
THRESHOLD_BASENAME = "threshold.json"


def _write_json_atomic(path: str, payload: dict) -> None:
    """pid-suffixed tmp + os.replace: concurrent readers never see a torn
    artifact, concurrent writers never share a tmp."""
    import json

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)

logger = get_logger("plumekit.cli")


def _add_root(p: argparse.ArgumentParser):
    p.add_argument("--root", default=os.environ.get("PLUMEKIT_ROOT", "data"),
                   help="workspace root (reference filepaths.py:7)")


def cmd_make_dataset(args) -> int:
    """Generate (synthetic) granules + a VIIRS-like fire CSV into the
    reference's directory layout."""
    from plumekit.io.granule import save_granule
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    paths = PathsConfig(root=args.root)
    maiac_dir = paths.ensure("maiac_dir")
    fires_dir = paths.ensure("fires_dir")
    fire_frames = []
    for i in range(args.n_granules):
        scene = make_scene(
            SyntheticSceneConfig(
                size=args.size, n_plumes=args.plumes, seed=args.seed + i,
                background_level=0.2, background_noise=0.05,
                plume_amplitude=(0.6, 0.8), plume_sigma_major=(9.0, 14.0),
                plume_sigma_minor=(1.8, 2.6),
                fires_per_plume=(7, 9), extra_fires=4, null_blobs=1,
            )
        )
        out = os.path.join(maiac_dir, scene.granule.name + ".npz")
        save_granule(out, scene.granule)
        fire_frames.append(scene.fires)
        logger.info("wrote %s (%d fires)", out, len(scene.fires))
    import pandas as pd

    fires = pd.concat(fire_frames, ignore_index=True)
    fire_csv = os.path.join(fires_dir, "fires.csv")
    fires.drop(columns=["date_time"]).to_csv(fire_csv, index=False)
    logger.info("wrote %s (%d rows)", fire_csv, len(fires))

    if args.viirs_swaths:
        from plumekit.io.viirs import make_synthetic_swath, save_swath

        sdr_dir = paths.ensure("viirs_sdr_dir")
        for i in range(args.viirs_swaths):
            swath = make_synthetic_swath(
                seed=args.seed + i, name=f"viirs_sdr_{args.seed + i:04d}"
            )
            out = os.path.join(sdr_dir, swath.name + ".npz")
            save_swath(out, swath)
            logger.info("wrote %s %s", out, swath.shape)

    if args.viirs_aod_pairs:
        from plumekit.io.viirs_aod import (make_synthetic_ivaot_scene,
                                           write_synthetic_pair)

        aod_dir = paths.ensure("viirs_aod_dir")
        geo_dir = paths.ensure("viirs_geo_dir")
        pair_fires = []
        for i in range(args.viirs_aod_pairs):
            stamp, aod, vlat, vlon, vfires, _ = make_synthetic_ivaot_scene(
                seed=args.seed + i)
            ap, gp = write_synthetic_pair(aod_dir, geo_dir, stamp, aod,
                                          vlat, vlon)
            pair_fires.append(vfires)
            logger.info("wrote %s + geo", os.path.basename(ap))
        vdf = pd.concat(pair_fires, ignore_index=True)
        vcsv = os.path.join(fires_dir, "fires_viirs_aod.csv")
        vdf.drop(columns=["date_time"]).to_csv(vcsv, index=False)
        logger.info("wrote %s (%d rows)", vcsv, len(vdf))
    return 0


def cmd_identify_viirs(args) -> int:
    """The reference notebook's workflow ("Identifying plumes from AOD and
    Active Fires", cells 4-25): IVAOT/GMTCO h5 pairs → 750 m UTM resample →
    fixed-threshold identify → per-granule plume bbox CSVs + labelled masks
    under ``raw/viirs/masks`` (``filepaths.py:21-23``)."""
    import pandas as pd

    from plumekit.io.fires import load_fire_csv
    from plumekit.io.viirs_aod import identify_viirs_aod, pair_granules

    paths = PathsConfig(root=args.root)
    aod_dir = paths.ensure("viirs_aod_dir")
    geo_dir = paths.ensure("viirs_geo_dir")
    masks_dir = paths.ensure("viirs_masks_dir")
    fire_csv = args.fires or os.path.join(paths.ensure("fires_dir"),
                                          "fires_viirs_aod.csv")
    if not os.path.exists(fire_csv):
        logger.error("no fire table at %s — run 'plumekit make_dataset "
                     "--viirs-aod-pairs' or point --fires at a VIIRS "
                     "fire CSV", fire_csv)
        return 1
    fire_df = load_fire_csv(fire_csv)

    pairs = pair_granules(aod_dir, geo_dir)
    if not pairs:
        logger.warning("no IVAOT/GMTCO pairs under %s / %s", aod_dir,
                       geo_dir)
        return 1
    for pair in pairs:
        base = os.path.splitext(os.path.basename(pair["aod"]))[0]
        out_csv = os.path.join(masks_dir, base + "_plumes.csv")
        if os.path.exists(out_csv):
            logger.info("%s already identified, continuing...", base)
            continue
        plume_dict, plume_image, aod_r, _ = identify_viirs_aod(
            pair["aod"], pair["geo"], fire_df,
            pixel_size_m=args.pixel_size)
        rows = [
            {"plume_id": pid, **bbox} for pid, bbox in plume_dict.items()
        ]
        # mask first, bbox CSV last: resume keys on the CSV, so a crash
        # between the two writes must not leave a CSV without its mask
        np.savez_compressed(os.path.join(masks_dir, base + "_mask.npz"),
                            plume_image=plume_image,
                            aod=np.nan_to_num(aod_r, nan=-999.0))
        pd.DataFrame(rows, columns=["plume_id", "min_r", "min_c", "max_r",
                                    "max_c"]).to_csv(out_csv, index=False)
        logger.info("%s: %d plume(s) → %s", base, len(plume_dict), out_csv)
    return 0


def cmd_resample_viirs(args) -> int:
    """Reproject VIIRS SDR swaths onto their modal UTM zone — the workflow
    the reference's ``reprojected_viirs`` path family and ``utm_resampler``
    (``filepaths.py:13-16``, ``tools.py:9-64``) exist for but never wire up."""
    from plumekit.io.viirs import (load_swath, reproject_swath,
                                   write_quicklooks, write_reprojected_h5)

    paths = PathsConfig(root=args.root)
    sdr_dir = paths.ensure("viirs_sdr_dir")
    h5_dir = paths.ensure("viirs_sdr_reproj_h5_dir")
    n_done = 0
    for fname in sorted(os.listdir(sdr_dir)):
        if not fname.endswith(".npz"):
            continue
        base = os.path.splitext(fname)[0]
        out_h5 = os.path.join(h5_dir, base + ".h5")
        if os.path.exists(out_h5):
            logger.info("%s already reprojected, continuing...", base)
            continue
        swath = load_swath(os.path.join(sdr_dir, fname))
        resampler, rasters = reproject_swath(
            swath, pixel_size_m=args.pixel_size,
            radius_of_influence_m=args.radius,
        )
        write_reprojected_h5(out_h5, resampler, rasters)
        if args.quicklooks:
            write_quicklooks(
                base, rasters,
                blue_dir=paths.ensure("viirs_sdr_reproj_blue_dir"),
                tcc_dir=paths.ensure("viirs_sdr_reproj_tcc_dir"),
            )
        n_done += 1
        logger.info("%s → %s (zone %d%s, %dx%d)", fname, out_h5,
                    resampler.zone, "S" if resampler.south else "N",
                    resampler.y_size, resampler.x_size)
    logger.info("reprojected %d swaths", n_done)
    return 0


def cmd_build_features(args) -> int:
    """Batch identify over every granule — the reference's
    ``plume_identifier_{rg,gaussian}.main()`` loop (resumable via WorkLog)."""
    import pandas as pd

    from plumekit.config.identify import (BasicIdentifyConfig,
                                          GaussianIdentifyConfig,
                                          RGIdentifyConfig)
    from plumekit.identify import rg as rg_mod
    from plumekit.identify import gaussian as gaussian_mod
    from plumekit.io.fires import load_fire_csv
    from plumekit.io.granule import GRANULE_EXTENSIONS, load_granule
    from plumekit.train.checkpoint import WorkLog

    paths = PathsConfig(root=args.root)
    maiac_dir = paths.ensure("maiac_dir")
    log = WorkLog(os.path.join(paths.ensure("log_dir"),
                               f"{args.detector}_log.txt"))
    fire_csv = os.path.join(paths.resolve("fires_dir"), "fires.csv")
    if not os.path.exists(fire_csv):
        logger.error("no fire table at %s — run 'plumekit make_dataset' "
                     "or place a VIIRS fire CSV there", fire_csv)
        return 1
    fire_df = load_fire_csv(fire_csv)
    aod_dir = paths.ensure("aod_df_dir")
    hull_dir = paths.ensure("hull_df_dir")

    from plumekit.io.dates import granule_date
    from plumekit.io.prefetch import decode_pool

    todo = []
    for fname in sorted(os.listdir(maiac_dir)):
        if not fname.endswith(GRANULE_EXTENSIONS):
            continue
        if log.done(fname):
            logger.info("%s already processed, continuing...", fname)
            continue
        todo.append(fname)

    def decode(fname):
        # MAIAC names carry the acquisition date (reference
        # plume_identifier_rg.py:574); synthetic granules fall back to the
        # fire table's date
        granule = load_granule(os.path.join(maiac_dir, fname))
        return fname, granule, granule_date(
            fname, default=fire_df.date_time.iloc[0])

    n_done = 0

    def write_rg(fname, granule, aod_df, hull_df, out):
        nonlocal n_done
        base = os.path.splitext(fname)[0]
        aod_df.to_csv(os.path.join(aod_dir, base + "_aod.csv"),
                      index=False)
        if not args.no_masks:
            # per-plume device masks keyed by hull id: the sharper
            # curated-training artifact (prepare_model_data prefers
            # these over convex-hull fills when present)
            masks = rg_mod.plume_masks(out)
            if masks:
                np.savez_compressed(
                    os.path.join(paths.ensure("plume_mask_dir"),
                                 base + "_masks.npz"),
                    **{str(pid): m for pid, m in masks.items()})
        if args.plot and len(aod_df):
            from plumekit.viz import plot_identify_bboxes

            plot_identify_bboxes(
                granule.first_layer(), aod_df,
                os.path.join(paths.ensure("plot_dir"),
                             base + "_plot.png"),
            )
        hull_df.to_csv(os.path.join(hull_dir, base + "_extent.csv"),
                       index=False)
        log.mark(fname)
        n_done += 1
        logger.info("%s: %d plumes", base,
                    hull_df.id.nunique() if len(hull_df) else 0)

    # decode granule i+1 while granule i identifies (config-5 overlap
    # applied to the reference's flagship batch loop: the identify sweep
    # blocks on the device with the GIL released, so even one decode
    # worker hides npz-inflate/HDF time behind it); depth bounds staged
    # granules in host RAM
    workers = max(1, min(4, (os.cpu_count() or 1) - 1))
    batch_scenes = args.batch_scenes
    if batch_scenes < 1:
        logger.error("--batch-scenes must be >= 1, got %d", batch_scenes)
        return 1
    if batch_scenes > 1 and args.detector != "rg":
        logger.error("--batch-scenes applies to the rg detector only")
        return 1
    stream = decode_pool(todo, decode, workers=workers,
                         depth=max(2, batch_scenes + 1))

    if batch_scenes > 1:
        # G same-shape scenes per dispatched program: the fixed dispatch
        # tax amortises across the group (72.9 -> 65.2 ms/scene at G=8 on
        # the tunneled v5e, BASELINE.md round 3); per-scene outputs are
        # bit-identical to the serial path. Shape changes flush the group
        # (the program is compiled per scene shape).
        buf = []

        def flush():
            if not buf:
                return
            results = rg_mod.identify_batch(
                [(g.first_layer(), g.lat, g.lon, d) for _, g, d in buf],
                fire_df, RGIdentifyConfig())
            for (fname, g, _d), (aod_df, hull_df, out) in zip(buf, results):
                write_rg(fname, g, aod_df, hull_df, out)
            buf.clear()

        for fname, granule, date in stream:
            if buf and granule.shape != buf[0][1].shape:
                flush()
            buf.append((fname, granule, date))
            if len(buf) == batch_scenes:
                flush()
        flush()
        logger.info("processed %d granules", n_done)
        return 0

    for fname, granule, date in stream:
        base = os.path.splitext(fname)[0]
        if args.detector == "rg":
            aod_df, hull_df, out = rg_mod.identify(
                granule.first_layer(), granule.lat, granule.lon, date,
                fire_df, RGIdentifyConfig(),
            )
            write_rg(fname, granule, aod_df, hull_df, out)
            continue
        if args.detector == "basic":
            from plumekit.identify.api import identify as api_identify

            # one basic implementation: the api handles negative-zeroing
            # and the bbox-row schema; the reference's basic main computed
            # CSV paths but never wrote them (SURVEY.md bug #10) — we
            # write the bboxes
            ps = api_identify(granule, fire_df, date, BasicIdentifyConfig())
            hull_df = ps.aod_stats
            if args.plot and len(hull_df):
                aod = granule.first_layer().copy()
                aod[aod < 0] = 0.0
                from plumekit.viz import plot_identify_bboxes

                plot_identify_bboxes(
                    aod, hull_df,
                    os.path.join(paths.ensure("plot_dir"),
                                 base + "_plot.png"),
                )
        else:
            hull_df = gaussian_mod.identify_granule(
                granule, fire_df, date, GaussianIdentifyConfig()
            )
            if args.plot and len(hull_df):
                from plumekit.viz import plot_identify_hulls

                plot_identify_hulls(
                    granule.first_layer(), hull_df,
                    os.path.join(paths.ensure("plot_dir"),
                                 base + "_plot.png"),
                )
        hull_df.to_csv(os.path.join(hull_dir, base + "_extent.csv"),
                       index=False)
        log.mark(fname)
        n_done += 1
        logger.info("%s: %d plumes", base,
                    hull_df.id.nunique() if len(hull_df) else 0)
    logger.info("processed %d granules", n_done)
    return 0


def cmd_prepare_model_data(args) -> int:
    """Rasterise curated hulls (reduced/plume/hull) into model-ready
    (channels, mask) samples under model_data_dir — the step between the
    reference's selector outputs (``plume_selector.py:229-233``) and its
    reserved ``interim/model_input`` (``filepaths.py:32``) that was never
    committed."""
    from plumekit.train.curated import build_model_data

    paths = PathsConfig(root=args.root)
    written = build_model_data(paths, fire_csv=args.fires,
                               use_masks=not args.hulls_only,
                               uncurated=args.uncurated)
    logger.info("wrote %d model-ready samples to %s", len(written),
                paths.resolve("model_data_dir"))
    return 0 if written else 1


def cmd_train_model(args) -> int:
    from plumekit.config.train import DataConfig, MeshConfig, TrainConfig, UNetConfig
    from plumekit.train.loop import train

    mesh = None
    if args.data_parallel > 1:
        mesh = MeshConfig(data=args.data_parallel)
    curated_dir = None
    if args.curated:
        curated_dir = PathsConfig(root=args.root).resolve("model_data_dir")
    distill_calibrate = None
    if args.distill_calibrate is not None:
        if args.distill_calibrate == "auto":
            import json as _json

            path = os.path.join(args.root, PathsConfig().model_dir,
                                THRESHOLD_BASENAME)
            try:
                with open(path) as f:
                    distill_calibrate = float(_json.load(f)["threshold"])
            except (OSError, ValueError, KeyError, TypeError,
                    _json.JSONDecodeError) as e:
                logger.error(
                    "--distill-calibrate given without a value but %s is "
                    "unreadable (%s); run evaluate_model --sweep-threshold "
                    "--write-threshold first or pass the value", path, e)
                return 1
            logger.info("distill calibration threshold %.2f from %s",
                        distill_calibrate, path)
        else:
            distill_calibrate = float(args.distill_calibrate)
    history = train(
        unet_cfg=UNetConfig(arch=args.arch,
                            deep_supervision=args.deep_supervision),
        train_cfg=TrainConfig(
            total_steps=args.steps, batch_size=args.batch_size,
            tile_size=args.tile, checkpoint_dir=os.path.join(
                args.root, PathsConfig().model_dir, "checkpoints"),
            steps_per_dispatch=args.steps_per_dispatch,
            quantize_transfer=args.quantize_transfer,
            device_data=args.device_data,
            distill_from=args.distill_from,
            distill_alpha=args.distill_alpha,
            distill_temp=args.distill_temp,
            distill_prune_level=args.distill_prune_level,
            distill_tta=args.distill_tta,
            distill_calibrate=distill_calibrate,
        ),
        data_cfg=DataConfig(granule_size=args.granule_size),
        mesh_cfg=mesh,
        weak_labels=args.weak_labels,
        curated_dir=curated_dir,
    )
    logger.info("final eval IoU %.3f", history["eval_iou"][-1])
    return 0


def _restore_variables(args):
    """Shared by predict/export: build the model state and restore the
    latest checkpoint (warns and keeps fresh weights if none exists).
    The architecture comes from the ``model_config.json`` the train loop
    persists next to the checkpoints — serving a UNet++ checkpoint through
    a UNet skeleton would fail (or worse, half-restore) otherwise."""
    import jax

    from plumekit.config.train import TrainConfig, UNetConfig
    from plumekit.train.checkpoint import (load_model_config,
                                           restore_checkpoint, latest_step)
    from plumekit.train.state import create_state

    ckpt_dir = args.checkpoint or os.path.join(args.root,
                                               PathsConfig().model_dir,
                                               "checkpoints")
    unet_cfg = load_model_config(ckpt_dir) or UNetConfig()
    pruned_cfg = unet_cfg
    if getattr(args, "prune_level", None):
        # serving-time UNet++ pruning (models/unetpp.effective_level):
        # the restore template below stays the FULL grid (the checkpoint
        # always holds every column); only the returned serving config is
        # truncated — the forward simply never reads the deeper params
        import dataclasses

        from plumekit.models.unetpp import effective_level

        pruned_cfg = dataclasses.replace(unet_cfg,
                                         prune_level=args.prune_level)
        try:
            effective_level(pruned_cfg)  # fail fast with the real message
        except ValueError as e:
            raise SystemExit(f"plumekit: --prune-level: {e}")
    state = create_state(jax.random.PRNGKey(0), unet_cfg, TrainConfig())
    if latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        logger.info("restored checkpoint step %s", latest_step(ckpt_dir))
    else:
        logger.warning("no checkpoint found in %s — using untrained "
                       "weights", ckpt_dir)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    return pruned_cfg, variables


class _CliError(Exception):
    """Usage/config error: message is logged, command exits 1."""


def _build_serving(args, unet_cfg, variables):
    """Build the inference program shared by predict_model and serve.

    Returns ``(infer, depth, batch_granules, infer_is_batched, use_int8,
    calib_tile)`` with the int8 decision and calibration tile size RESOLVED
    against an exported artifact's metadata when ``--exported`` is given
    (an int8 artifact self-configures: the artifact's recorded tile size
    drives the calibration grid so serving it is deterministic regardless
    of ``--tile``). Raises :class:`_CliError` on invalid flag combinations.
    """
    if getattr(args, "tuned", None):
        _apply_tuned(args, unet_cfg)
    use_int8, calib_tile = args.int8, args.tile
    if getattr(args, "exported", None):
        # AOT-exported serving artifact (plumekit.infer.export): the whole
        # inference program is deserialized StableHLO — no model re-trace
        if getattr(args, "tta", False):
            raise _CliError(
                "--tta and --exported are mutually exclusive: the exported "
                "program's forward is baked in — export with `export_model "
                "--tta` to ship a TTA artifact")
        if getattr(args, "mesh_devices", 0):
            raise _CliError(
                "--mesh-devices and --exported are mutually exclusive: the "
                "exported program's device layout is baked in — serve the "
                "live model on the mesh instead")
        # NB --threshold still applies: persisted masks are thresholded at
        # write time from the artifact's probs (_write_prediction); only
        # the program's internal mask output carries the export-time bake
        from plumekit.infer.export import load_exported

        infer, meta = load_exported(args.exported)
        depth = int(meta["depth"])
        batch_granules = int(meta["granules"])
        infer_is_batched = batch_granules > 1
        logger.info("serving exported program %s (granule %s, G=%d)",
                    args.exported, tuple(meta["granule_hw"]), batch_granules)
        exported_forward = meta.get("forward", "flax")
        if args.int8 and exported_forward != "int8":
            raise _CliError(
                f"--int8 passed but {args.exported} was exported with the "
                f"fp forward; re-export with export_model --int8")
        use_int8 = exported_forward == "int8"
        if use_int8:
            calib_tile = int(meta["tile_size"])
        return (infer, depth, batch_granules, infer_is_batched, use_int8,
                calib_tile)

    from plumekit.config.train import InferConfig
    from plumekit.infer import make_sliding_infer
    from plumekit.models import build_model

    model = build_model(unet_cfg)
    if args.fused and args.int8:
        raise _CliError("--fused and --int8 are mutually exclusive "
                        "forward paths")
    if args.fused:
        if unet_cfg.arch != "unet":
            raise _CliError("--fused (Pallas forward) supports the unet "
                            f"architecture only; checkpoint is "
                            f"{unet_cfg.arch}")
        from plumekit.models.fused_forward import make_fused_apply

        apply_fn = make_fused_apply(unet_cfg)
    elif args.int8:
        try:
            from plumekit.models.quantized_forward import (
                make_quantized_apply)

            apply_fn = make_quantized_apply(unet_cfg)
        except ValueError as e:
            raise _CliError(f"--int8: {e}")
    else:
        apply_fn = model.apply
    if getattr(args, "tta", False):
        # D4-averaged forward (8 views folded into ONE tile batch);
        # composes with every forward above — see plumekit.infer.tta
        from plumekit.infer.tta import make_tta_apply

        apply_fn = make_tta_apply(apply_fn)
    icfg = InferConfig(tile_size=args.tile, overlap=args.overlap,
                       batch_tiles=getattr(args, "batch_tiles", 64),
                       threshold=_resolve_threshold(args))
    mesh_n = int(getattr(args, "mesh_devices", 0) or 0)
    if mesh_n:
        # pod-slice serving (VERDICT round-4 #4): shard the granule group
        # over a D-device mesh — every device runs its local
        # --batch-granules granules' tile grids in one program
        # (make_batch_infer_sharded, the tested config-5 DP shape). The
        # stream feeds fixed D·G groups through the infer_is_batched path
        # (ragged tails pad by repeating the last granule).
        import jax
        from jax.sharding import Mesh

        from plumekit.infer import make_batch_infer_sharded

        if args.fused:
            raise _CliError("--fused and --mesh-devices are not supported "
                            "together (the fused Pallas forward is a "
                            "single-chip path)")
        devs = jax.devices()
        if mesh_n == -1:
            mesh_n = len(devs)
        if mesh_n < 2:
            raise _CliError(
                f"--mesh-devices needs at least 2 devices (got {mesh_n}); "
                "omit the flag for single-device serving")
        if len(devs) < mesh_n:
            raise _CliError(
                f"--mesh-devices {mesh_n} requested but only {len(devs)} "
                f"device(s) visible ({devs[0].platform})")
        mesh = Mesh(np.asarray(devs[:mesh_n]), ("data",))
        infer = make_batch_infer_sharded(apply_fn, mesh, icfg,
                                         channels=unet_cfg.in_channels)
        group = mesh_n * max(1, args.batch_granules)
        logger.info("serving on a %d-device mesh (%s), %d granules per "
                    "dispatched program (%d per device)", mesh_n,
                    devs[0].platform, group, group // mesh_n)
        return infer, unet_cfg.depth, group, True, use_int8, calib_tile
    infer = make_sliding_infer(apply_fn, icfg,
                               channels=unet_cfg.in_channels)
    return infer, unet_cfg.depth, args.batch_granules, False, use_int8, \
        calib_tile


def _resolve_threshold(args) -> float:
    """Serving mask threshold: the explicit ``--threshold`` flag wins;
    otherwise the calibrated artifact ``<root>/models/threshold.json``
    (``evaluate_model --sweep-threshold --write-threshold``) if present,
    with an info log so the operating point is never silent; else the
    reference-era default 0.5."""
    import json

    t = getattr(args, "threshold", None)
    if t is not None:
        return float(t)
    path = os.path.join(args.root, PathsConfig().model_dir,
                        THRESHOLD_BASENAME)
    if os.path.exists(path):
        try:
            with open(path) as f:
                payload = json.load(f)
            t = float(payload["threshold"])
        except (OSError, ValueError, KeyError, TypeError,
                json.JSONDecodeError) as e:
            logger.warning("%s unreadable (%s) — serving threshold 0.5",
                           path, e)
            return 0.5
        logger.info("serving calibrated threshold %.2f from %s (dev %s="
                    "%s; --threshold 0.5 restores the default)", t, path,
                    payload.get("metric"), payload.get("value"))
        return t
    return 0.5


def _apply_tuned(args, unet_cfg=None) -> None:
    """Resolve ``--tuned`` into the four geometry flags (tile, overlap,
    batch_tiles, batch_granules) from a `plumekit tune` artifact. The
    explicit flags are overridden by design: the artifact IS the
    measurement the flags guess at. Warns (but still applies) when the
    artifact was measured for a different forward — the optimum is
    forward-dependent (int8 vs bf16 and the architectures have different
    measured optima, BASELINE.md), so the operator should re-tune."""
    import json

    from plumekit.infer.tune import TUNED_BASENAME, load_tuned

    if getattr(args, "exported", None):
        raise _CliError(
            "--tuned and --exported are mutually exclusive: an exported "
            "artifact's geometry is baked into its program")
    tpath = args.tuned
    if tpath == "auto":
        tpath = os.path.join(args.root, PathsConfig().model_dir,
                             TUNED_BASENAME)
    try:
        payload = load_tuned(tpath)
    except FileNotFoundError:
        raise _CliError(
            f"--tuned: {tpath} not found — run `plumekit tune` first")
    except (OSError, ValueError, json.JSONDecodeError) as e:
        raise _CliError(f"--tuned: {e}")
    for field, want, label in (
            ("int8", bool(getattr(args, "int8", False)), "forward"),
            ("arch", getattr(unet_cfg, "arch", None), "architecture")):
        have = payload.get(field)
        if have is not None and want is not None and have != want:
            logger.warning(
                "--tuned: artifact was measured with %s=%s but serving "
                "%s=%s — the optimum is %s-dependent, re-run `plumekit "
                "tune` for this configuration", field, have, field, want,
                label)
    best = payload["best"]
    args.tile, args.overlap = best["tile"], best["overlap"]
    args.batch_tiles = best["batch_tiles"]
    args.batch_granules = best["granules"]
    logger.info(
        "tuned geometry from %s (measured %s on %s): tile %d/%d, "
        "batch_tiles %d, G=%d — %.1f MPix/s",
        tpath, payload.get("measured_utc"), payload.get("device_kind"),
        args.tile, args.overlap, args.batch_tiles, args.batch_granules,
        best.get("mpix_s") or float("nan"))


def _int8_quantize_from_paths(granule_paths, tile, unet_cfg, variables,
                              depth, known_null=None, max_candidates=4,
                              on_decode_error=None):
    """Post-training calibration on the first NON-DEGENERATE granule among
    ``granule_paths``. Calibration replays the fp forward eagerly, so it
    runs on a 3×3 grid of tiles, not the whole granule (a swath-scale
    granule's full-resolution fp32 activations would not fit HBM even
    though the tiled inference itself does).

    Returns ``(qvars_or_None, predecoded)``: every decode performed here is
    handed back via ``predecoded`` so the stream never decodes twice, and
    ``None`` means no usable granule was found among the first
    ``max_candidates`` unchecked candidates. Granules found all-null (an
    ocean/cloud scene would collapse every activation scale to ~0 and clip
    all later real signal to ±127 — silently garbage masks) are recorded in
    ``known_null`` (mutated in place when given) so a long-running caller
    does not re-decode them every cycle; they still get predicted like any
    other granule once calibration succeeds.

    A candidate whose DECODE raises is fatal by default (batch predict
    wants the traceback); a long-running caller passes ``on_decode_error``
    to quarantine the granule and keep searching."""
    from plumekit.infer.streaming import decode_granule_channels
    from plumekit.models.quantized_forward import quantize_unet

    candidates = [p for p in granule_paths
                  if known_null is None
                  or os.path.basename(p) not in known_null]
    predecoded, chosen, calib = {}, None, None
    for path in candidates[:max_candidates]:
        try:
            cand = decode_granule_channels(path, depth)
        except Exception:
            if on_decode_error is None:
                raise
            on_decode_error(path)
            continue
        predecoded[path] = cand  # every decode is reused by the stream
        if float(np.abs(cand[1]).max()) > 1e-3:
            chosen, calib = path, cand[1]
            break
        logger.warning("int8: %s is all-null — not usable for "
                       "calibration, trying the next granule",
                       os.path.basename(path))
        if known_null is not None:
            known_null.add(os.path.basename(path))
    if chosen is None:
        return None, predecoded
    h, w = calib.shape[:2]
    div = 2 ** unet_cfg.depth
    t = max(div, min(tile - tile % div, h, w))
    ys = sorted({int(v) for v in np.linspace(0, h - t, 3)})
    xs = sorted({int(v) for v in np.linspace(0, w - t, 3)})
    tiles = np.stack([calib[y:y + t, x:x + t] for y in ys for x in xs])
    qvars = quantize_unet(variables, unet_cfg, tiles)
    logger.info("int8: calibrated on %d %d² tiles of %s, serving the "
                "s8 forward", len(tiles), t, os.path.basename(chosen))
    return qvars, predecoded


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else


def _sweep_stale_tmps(out_dir) -> None:
    """Remove leftover atomic-write temporaries from a CRASHED writer.
    Only the writers (predict_model / serve) call this — readers never
    delete tmps (the checkpoint-recovery discipline) — and a tmp whose
    embedded pid is still alive belongs to a concurrently running writer
    (serve next to a predict_model backfill on the same root): deleting it
    would crash that writer's os.replace and lose its prediction."""
    for f in os.listdir(out_dir):
        if f.startswith(".") and ".tmp" in f and f.endswith(".npz"):
            try:
                pid = int(f.rsplit(".tmp", 1)[1][:-len(".npz")])
            except ValueError:
                continue  # not one of ours — leave it alone
            if _pid_alive(pid):
                continue
            try:
                os.remove(os.path.join(out_dir, f))
            except OSError:
                pass


def _write_prediction(out_dir, name, probs, plot=False, granule_path=None,
                      threshold=0.5):
    """Atomically write ``<name>_pred.npz`` (tmp + ``os.replace`` — a crash
    never leaves a half-written artifact that a reader, or the serve
    worklog, would trust) and optionally the quicklook PNG. The mask is
    thresholded HERE (from the full-precision probs, at the resolved
    serving threshold) so the persisted artifact honours
    ``--threshold``/``threshold.json`` regardless of which program
    produced the probs (live, int8, exported — whose baked mask output
    the stream does not use)."""
    out = os.path.join(out_dir, name + "_pred.npz")
    tmp = os.path.join(out_dir, f".{name}_pred.tmp{os.getpid()}.npz")
    mask = probs > threshold
    np.savez_compressed(tmp, probs=probs, mask=mask,
                        threshold=np.float32(threshold))
    os.replace(tmp, out)
    logger.info("%s: %.1f%% plume pixels (threshold %.2f)", out,
                100.0 * float(mask.mean()), threshold)
    if plot and granule_path is not None:
        from plumekit.io.granule import NULL_VALUE, load_granule
        from plumekit.viz import plot_prediction

        aod = load_granule(granule_path).first_layer().copy()
        aod[aod == NULL_VALUE] = 0.0
        plot_prediction(aod, probs, os.path.join(out_dir, name + "_pred.png"))
    return out


def cmd_predict_model(args) -> int:
    """Sliding-window inference over granules → plume-probability NPZs."""
    from plumekit.io.granule import GRANULE_EXTENSIONS

    paths = PathsConfig(root=args.root)
    unet_cfg, variables = _restore_variables(args)
    try:
        (infer, depth, batch_granules, infer_is_batched, use_int8,
         calib_tile) = _build_serving(args, unet_cfg, variables)
    except _CliError as e:
        logger.error("%s", e)
        return 1

    out_dir = paths.ensure("predictions_dir")
    maiac_dir = paths.ensure("maiac_dir")
    _sweep_stale_tmps(out_dir)
    granule_paths = [
        os.path.join(maiac_dir, f)
        for f in sorted(os.listdir(maiac_dir))
        if f.endswith(GRANULE_EXTENSIONS)
    ]
    predecoded = None
    if use_int8 and granule_paths:
        variables, predecoded = _int8_quantize_from_paths(
            granule_paths, calib_tile, unet_cfg, variables, depth)
        if variables is None:
            logger.error("int8: no granule with signal among the first %d "
                         "of %d — refusing to serve with degenerate "
                         "calibration scales",
                         min(4, len(granule_paths)), len(granule_paths))
            return 1

    # streaming pipeline (config 5): decode+stage granule i+1 while granule i
    # runs on device
    from plumekit.infer.streaming import stream_inference

    threshold = _resolve_threshold(args)
    for name, probs in stream_inference(
        granule_paths, infer, variables, depth,
        quantize=args.quantize, batch_granules=batch_granules,
        infer_is_batched=infer_is_batched, predecoded=predecoded,
        quantize_output=args.quantize_output,
    ):
        gp = next((p for p in granule_paths
                   if os.path.splitext(os.path.basename(p))[0] == name),
                  None) if args.plot else None
        _write_prediction(out_dir, name, probs, plot=args.plot,
                          granule_path=gp, threshold=threshold)
    return 0


def cmd_tune(args) -> int:
    """Measure candidate serving geometries on the attached device and
    persist the ranked table; ``predict_model/serve --tuned`` then serve
    the winner (see :mod:`plumekit.infer.tune`). Runs on untrained
    weights by default — throughput does not depend on the values — so
    it works before any training has happened."""
    import json

    from plumekit.infer.tune import (DEFAULT_CANDIDATES, TUNED_BASENAME,
                                     parse_candidates, save_tuned,
                                     tune_geometry)
    from plumekit.models import build_model
    from plumekit.utils.backend import probe_backend, should_probe

    if should_probe():
        # the sweep is a long TPU run: probe the tunneled backend in a
        # bounded subprocess first instead of blocking ~25 min in-process
        # on an outage (the round-3 lesson, CLAUDE.md)
        try:
            probe_backend()
        except RuntimeError as e:
            logger.error("tune: %s", e)
            return 1

    unet_cfg, variables = _restore_variables(args)
    if args.int8:
        import jax.numpy as jnp

        from plumekit.models.quantized_forward import (make_quantized_apply,
                                                       quantize_unet)

        try:
            apply_fn = make_quantized_apply(unet_cfg)
        except ValueError as e:
            logger.error("--int8: %s", e)
            return 1
        # synthetic calibration tiles: scale VALUES don't affect the
        # timed program's structure (bench.py does the same); serving
        # still calibrates on a real granule at predict/serve time
        calib = jnp.asarray(np.random.default_rng(1).random(
            (4, args.tile_calib, args.tile_calib, unet_cfg.in_channels),
            np.float32))
        variables = quantize_unet(variables, unet_cfg, calib)
    else:
        apply_fn = build_model(unet_cfg).apply
    try:
        granules = [int(x) for x in
                    args.granules_per_program.split(",") if x.strip()]
        geoms = parse_candidates(args.candidates or DEFAULT_CANDIDATES,
                                 granules)
    except ValueError as e:
        logger.error("tune: %s", e)
        return 1
    try:
        payload = tune_geometry(
            apply_fn, variables, unet_cfg.in_channels, args.granule, geoms,
            repeats=args.repeats,
            progress=lambda msg: logger.info("tune: %s", msg))
    except RuntimeError as e:
        logger.error("tune: %s", e)
        return 1
    payload["int8"] = bool(args.int8)
    payload["arch"] = unet_cfg.arch
    out = args.out or os.path.join(args.root, PathsConfig().model_dir,
                                   TUNED_BASENAME)
    save_tuned(out, payload)
    logger.info("tuned geometry written to %s", out)
    best = payload["best"]
    print(json.dumps({"best": best, "best_blended": payload["best_blended"],
                      "out": out}))
    return 0


def cmd_serve(args) -> int:
    """Continuous serving: watch the granule directory and predict new
    arrivals as they land (see :mod:`plumekit.infer.serve`). The program is
    built once; each cycle scans for granules not yet in the serve worklog,
    runs them through the config-5 streaming pipeline, writes outputs
    atomically, and marks them done. SIGINT/SIGTERM stop gracefully."""
    import signal
    import threading

    from plumekit.io.granule import GRANULE_EXTENSIONS
    from plumekit.infer.serve import UnionLog, serve_loop
    from plumekit.infer.streaming import stream_inference
    from plumekit.train.checkpoint import WorkLog

    paths = PathsConfig(root=args.root)
    unet_cfg, variables = _restore_variables(args)
    try:
        (infer, depth, batch_granules, infer_is_batched, use_int8,
         calib_tile) = _build_serving(args, unet_cfg, variables)
    except _CliError as e:
        logger.error("%s", e)
        return 1

    out_dir = paths.ensure("predictions_dir")
    maiac_dir = paths.ensure("maiac_dir")
    _sweep_stale_tmps(out_dir)
    worklog = WorkLog(os.path.join(out_dir, "served_granules.txt"))
    # a granule whose decode/inference fails deterministically (corrupt
    # upload that finished, unsupported format) is quarantined here so it
    # cannot crash-loop the daemon; operators fix/remove the file and
    # delete its line to retry
    failed_log = WorkLog(os.path.join(out_dir, "failed_granules.txt"))

    stop = threading.Event()

    def _on_signal(signum, _frame):
        logger.info("serve: received signal %d — finishing the current "
                    "granule, then exiting", signum)
        stop.set()

    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:
            pass  # not the main thread (tests drive serve_loop directly)

    # int8 state shared across cycles: calibrate lazily on the first
    # granule with signal; until then every cycle defers its whole batch
    # (serving uncalibrated would produce garbage masks). known_null
    # remembers unusable candidates so they are not re-decoded every poll.
    state = {"variables": None if use_int8 else variables,
             "known_null": set(), "warned": False, "failures": 0}

    def quarantine(gpath):
        failed_log.mark(os.path.basename(gpath))
        state["failures"] += 1
        logger.exception("serve: %s failed — quarantined in "
                         "failed_granules.txt (delete its line to retry)",
                         os.path.basename(gpath))

    def serve_paths(paths_list, predecoded, served_acc):
        """Stream a list of granules; write + mark each as it completes,
        appending to ``served_acc`` — so granules served before a
        mid-stream failure still count when the caller catches it."""
        path_iter = iter(paths_list)
        # resolved per batch, not per granule: a recalibrated
        # threshold.json applies from the next scan without restart
        threshold = _resolve_threshold(args)
        for name, probs in stream_inference(
            paths_list, infer, state["variables"], depth,
            quantize=args.quantize, batch_granules=batch_granules,
            infer_is_batched=infer_is_batched, predecoded=predecoded,
            quantize_output=args.quantize_output,
        ):
            # ordered stream: the i-th yield is the i-th path
            gpath = next(path_iter)
            stem = os.path.splitext(os.path.basename(gpath))[0]
            if stem != name:
                logger.warning("serve: granule name %r differs from file "
                               "stem %r — worklog keys by filename", name,
                               stem)
            _write_prediction(out_dir, name, probs, plot=args.plot,
                              granule_path=gpath, threshold=threshold)
            worklog.mark(os.path.basename(gpath))
            served_acc.append(os.path.basename(gpath))
            if stop.is_set():
                break  # unserved granules stay pending for the restart

    def process_batch(pending):
        predecoded = None
        if state["variables"] is None:
            qvars, predecoded = _int8_quantize_from_paths(
                pending, calib_tile, unet_cfg, variables, depth,
                known_null=state["known_null"], on_decode_error=quarantine)
            if qvars is None:
                if not state["warned"]:
                    logger.warning(
                        "int8: no granule with signal yet among %d pending "
                        "— deferring until a calibratable granule arrives",
                        len(pending))
                    state["warned"] = True
                return 0
            state["variables"] = qvars
        acc = []
        try:
            serve_paths(pending, predecoded, acc)
            return len(acc)
        except Exception:
            logger.exception("serve: batched pass failed — isolating per "
                             "granule to locate the poison granule")
        # per-granule isolation: everything already marked (served or
        # quarantined) is skipped; a granule that fails alone is the
        # culprit and gets quarantined so it cannot crash-loop the daemon
        done = set(acc) | failed_log.items()
        for gpath in pending:
            if os.path.basename(gpath) in done or stop.is_set():
                continue
            try:
                serve_paths([gpath], None, acc)
            except Exception:
                quarantine(gpath)
        return len(acc)

    stats = serve_loop(
        maiac_dir, UnionLog(worklog, failed_log), process_batch,
        GRANULE_EXTENSIONS, poll_s=args.poll, once=args.once,
        idle_exit=args.idle_exit, max_cycles=args.max_cycles,
        settle_s=args.settle, stop_event=stop,
    )
    logger.info("serve: exit (%s) after %d cycle(s), %d granule(s) served, "
                "%d quarantined", stats.stopped_by, stats.cycles,
                stats.served, state["failures"])
    if args.once and state["failures"]:
        return 1  # batch semantics: a --once invocation reports failures
    return 0


def cmd_export_model(args) -> int:
    """AOT-export the inference program to a portable serving artifact
    (StableHLO via ``jax.export``) — serve without model code or re-trace."""
    from plumekit.config.train import InferConfig, UNetConfig
    from plumekit.infer.export import export_sliding_infer, save_exported

    unet_cfg, variables = _restore_variables(args)
    div = 2 ** unet_cfg.depth
    h = args.granule + (-args.granule) % div
    w = (args.granule_width or args.granule)
    w += (-w) % div
    if (h, w) != (args.granule, args.granule_width or args.granule):
        logger.info("granule padded to (%d, %d) for 2**depth divisibility",
                    h, w)
    icfg = InferConfig(tile_size=args.tile, overlap=args.overlap,
                       batch_tiles=args.batch_tiles,
                       threshold=_resolve_threshold(args))
    try:
        exported, meta = export_sliding_infer(
            variables, unet_cfg, icfg, (h, w),
            granules=args.batch_granules,
            platforms=[p.strip() for p in args.platforms.split(",")
                       if p.strip()],
            forward="int8" if args.int8 else "flax",
            tta=getattr(args, "tta", False),
        )
    except ValueError as e:
        logger.error("export failed: %s", e)
        return 1
    out = args.out or os.path.join(args.root, PathsConfig().model_dir,
                                   "exported")
    save_exported(exported, meta, out)
    print(out)
    return 0


def cmd_evaluate_model(args) -> int:
    """Score a checkpoint (or saved predictions) against model-ready
    labels: per-sample + pooled IoU/dice/precision/recall. The measurement
    step the reference's empty ``src/models/`` skeleton promised — see
    ``plumekit.train.evaluate``."""
    import json

    from plumekit.train.evaluate import (evaluate_model_data,
                                         evaluate_predictions, write_report)

    paths = PathsConfig(root=args.root)
    data_dir = args.data or paths.resolve("model_data_dir")
    out_csv = args.out or paths.resolve("evaluation_csv")
    # fail BEFORE the (potentially minutes-long) inference pass: the
    # deep object_counts validation would otherwise surface as a raw
    # traceback after all the forward work is done
    if not 0.0 < args.match_iou <= 1.0:
        logger.error("--match-iou must be in (0, 1], got %s",
                     args.match_iou)
        return 1
    if args.min_size < 1:
        logger.error("--min-size must be >= 1, got %s", args.min_size)
        return 1
    if args.bootstrap < 0:
        logger.error("--bootstrap must be >= 0, got %s", args.bootstrap)
        return 1
    if args.objects and args.sweep_threshold:
        logger.error(
            "--objects and --sweep-threshold are exclusive: the sweep "
            "scores every candidate threshold (use a plume metric, e.g. "
            "--sweep-threshold obj_f1, to sweep at the plume level); "
            "run --objects separately at the calibrated threshold")
        return 1
    if args.bootstrap and args.sweep_threshold:
        # the sweep path prints its table and returns before either
        # bootstrap block runs — fail fast instead of silently ignoring
        # the flag (same contract as the --objects conflict above)
        logger.error(
            "--bootstrap and --sweep-threshold are exclusive: CIs attach "
            "to a single-threshold evaluation; sweep first, then re-run "
            "evaluate_model --bootstrap at the calibrated threshold")
        return 1
    infer = None
    if not args.predictions:
        from plumekit.config.train import InferConfig
        from plumekit.infer import make_sliding_infer
        from plumekit.models import build_model

        unet_cfg, variables = _restore_variables(args)
        infer = make_sliding_infer(build_model(unet_cfg).apply,
                                   InferConfig(tile_size=args.tile,
                                               overlap=args.overlap),
                                   channels=unet_cfg.in_channels)

    if args.sweep_threshold:
        from plumekit.train.evaluate import (METRIC_KEYS,
                                             OBJECT_METRIC_KEYS,
                                             best_threshold,
                                             inference_prob_pairs,
                                             prediction_prob_pairs,
                                             sweep_object_thresholds,
                                             sweep_thresholds)

        if args.sweep_threshold not in METRIC_KEYS + OBJECT_METRIC_KEYS:
            # fail BEFORE the (potentially minutes-long) inference pass
            logger.error("--sweep-threshold: unknown metric %r (one of %s)",
                         args.sweep_threshold,
                         ", ".join(METRIC_KEYS + OBJECT_METRIC_KEYS))
            return 1
        pairs = (prediction_prob_pairs(args.predictions, data_dir)
                 if args.predictions
                 else inference_prob_pairs(infer, variables, data_dir))
        if args.sweep_threshold in OBJECT_METRIC_KEYS:
            # the pixel and plume optima genuinely differ (BASELINE.md):
            # sweep in the metric the campaign serves for
            sweep = sweep_object_thresholds(pairs, match_iou=args.match_iou,
                                            min_size=args.min_size)
        else:
            sweep = sweep_thresholds(pairs)
        sweep_csv = os.path.join(os.path.dirname(out_csv) or ".",
                                 "threshold_sweep.csv")
        sweep.to_csv(sweep_csv, index=False)
        t, v = best_threshold(sweep, metric=args.sweep_threshold)
        payload = {"threshold": t, "metric": args.sweep_threshold,
                   "value": round(v, 4),
                   "at_default": round(float(sweep.loc[
                       (sweep.threshold - 0.5).abs().idxmin(),
                       args.sweep_threshold]), 4),
                   "sweep_csv": sweep_csv}
        if args.write_threshold:
            tpath = os.path.join(args.root, PathsConfig().model_dir,
                                 THRESHOLD_BASENAME)
            _write_json_atomic(tpath, {
                **payload,
                "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime())})
            payload["out"] = tpath
            logger.info("calibrated threshold %.2f written to %s (serving "
                        "reads it automatically)", t, tpath)
        print(json.dumps(payload))
        return 0

    if args.objects:
        from plumekit.train.evaluate import (evaluate_objects,
                                             inference_prob_pairs,
                                             objects_csv_path,
                                             prediction_prob_pairs)

        pairs = (prediction_prob_pairs(args.predictions, data_dir)
                 if args.predictions
                 else inference_prob_pairs(infer, variables, data_dir))
        odf = evaluate_objects(pairs, threshold=args.threshold,
                               match_iou=args.match_iou,
                               min_size=args.min_size)
        obj_csv = objects_csv_path(out_csv)
        odf.to_csv(obj_csv, index=False)
        micro = odf[odf.name == "micro"].iloc[0]
        payload = {
            "samples": int(len(odf) - 1),
            "pred_plumes": int(micro.pred_plumes),
            "true_plumes": int(micro.true_plumes),
            **{k: round(float(micro[k]), 4)
               for k in ("obj_precision", "obj_recall", "obj_f1")},
            "out": obj_csv}
        if args.bootstrap:
            from plumekit.train.evaluate import bootstrap_from_df
            payload["ci95"] = {
                k: [round(lo, 4), round(hi, 4)] for k, (lo, hi) in
                bootstrap_from_df(odf, kind="object",
                                  n_boot=args.bootstrap).items()}
        print(json.dumps(payload))
        return 0

    if args.predictions:
        df = evaluate_predictions(args.predictions, data_dir,
                                  threshold=args.threshold)
    else:
        df = evaluate_model_data(infer, variables, data_dir,
                                 threshold=args.threshold)
    payload = write_report(df, out_csv)
    if args.bootstrap:
        from plumekit.train.evaluate import bootstrap_from_df
        payload["ci95"] = {
            k: [round(lo, 4), round(hi, 4)] for k, (lo, hi) in
            bootstrap_from_df(df, n_boot=args.bootstrap).items()}
    print(json.dumps(payload))
    return 0


def cmd_report(args) -> int:
    """Campaign summary under ``<root>/reports/`` — the content of the
    reference's promised-but-empty reports tree (``README.md:50-52``)."""
    from plumekit.viz.report import build_report

    print(build_report(args.root, out_dir=args.out))
    return 0


def cmd_verify_real_granule(args) -> int:
    """Run one granule FILE through the real-data contract register
    (docs/parity.md): decode with named-error discipline, grid/value/
    resample sanity, optional detector smoke run. Exit 0 iff every
    non-skipped check passed — the acceptance gate for the first real
    MCD19A2/IVAOT file this deployment sees."""
    import json

    from plumekit.io.verify import verify_granule

    res = verify_granule(args.granule, fires_csv=args.fires,
                         detector=args.detector,
                         run_identify=not args.no_identify)
    for c in res.checks:
        logger.info("%-18s %-4s %s", c.name, c.status.upper(), c.detail)
    print(json.dumps(res.summary()))
    return 0 if res.ok else 1


def cmd_identify(args) -> int:
    """Single-granule identification (any detector)."""
    from plumekit.config.identify import (
        BasicIdentifyConfig, GaussianIdentifyConfig, RGIdentifyConfig,
    )
    from plumekit.identify.api import identify
    from plumekit.io.fires import load_fire_csv
    from plumekit.io.granule import load_granule

    cfg = {"rg": RGIdentifyConfig(), "gaussian": GaussianIdentifyConfig(),
           "basic": BasicIdentifyConfig()}[args.detector]
    from plumekit.io.dates import granule_date

    granule = load_granule(args.granule)
    fire_df = load_fire_csv(args.fires)
    # date the scene from the granule FILENAME (MAIAC acq-date) like
    # build_features does; the fire CSV's first row is only a fallback —
    # a multi-day CSV would otherwise subset fires to an arbitrary date
    date = granule_date(os.path.basename(args.granule),
                        default=fire_df.date_time.iloc[0])
    ps = identify(granule, fire_df, date, cfg)
    print(f"{len(ps)} plumes")
    if args.out and len(ps.hulls):
        ps.hulls.to_csv(args.out, index=False)
        logger.info("wrote %s", args.out)
    return 0


def cmd_select(args) -> int:
    """Curation: export review artifacts or apply a decisions CSV
    (reference plume_selector.main semantics, non-blocking)."""
    import pandas as pd

    from plumekit.io.granule import find_granule, load_granule
    from plumekit.label import export_review_batch, apply_decisions

    paths = PathsConfig(root=args.root)
    hull_dir = paths.ensure("hull_df_dir")
    maiac_dir = paths.ensure("maiac_dir")
    keep_set = None
    if args.decisions:
        def truthy(v) -> bool:
            # a manifest keep column with blanks + 1s reads back as
            # float64, so str(v) is "1.0" — accept numeric truthiness too
            sv = str(v).strip().lower()
            if sv in ("1", "true", "yes", "y"):
                return True
            try:
                return float(sv) == 1.0
            except ValueError:
                return False

        dec = pd.read_csv(args.decisions)
        keep_set = {
            (int(r.id), str(r.datetime))
            for r in dec.itertuples() if truthy(r.keep)
        }
    for fname in sorted(os.listdir(hull_dir)):
        if not fname.endswith("_extent.csv"):
            continue
        hull_df = pd.read_csv(os.path.join(hull_dir, fname))
        if not {"hull_x", "hull_y"} <= set(hull_df.columns):
            # the basic detector writes bbox-only extent CSVs into the same
            # hull_dir — they carry no hulls to curate; skip, don't crash
            logger.info("%s has no hull columns (basic detector) — "
                        "skipping curation", fname)
            continue
        if "datetime" not in hull_df.columns:
            hull_df["datetime"] = "layer0"
        base = fname.replace("_extent.csv", "")
        gpath = find_granule(maiac_dir, base)
        if gpath is None:
            logger.warning("no granule for %s", fname)
            continue
        granule = load_granule(gpath)
        if keep_set is not None:
            kept, rejected = apply_decisions(
                hull_df, granule,
                lambda r: (r.plume_id, r.datetime) in keep_set,
            )
            kept.to_csv(os.path.join(paths.ensure("reduced_plume_hull_dir"),
                                     fname), index=False)
            rejected.to_csv(
                os.path.join(paths.ensure("reduced_not_plume_hull_dir"),
                             fname), index=False)
            logger.info("%s: kept %d / rejected %d plume rows", base,
                        len(kept), len(rejected))
        else:
            scores = None
            if args.rank_with_predictions is not None:
                scores = _curation_scores(args, paths, base, hull_df)
            out_dir = os.path.join(args.root, "review", base)
            manifest = export_review_batch(hull_df, granule, out_dir,
                                           scores=scores)
            logger.info("%s: %d plumes staged for review in %s%s", base,
                        len(manifest), out_dir,
                        " (model-ranked)" if scores is not None else "")
    return 0


def _curation_scores(args, paths, base, hull_df):
    """Per-plume model-support scores for ``select --rank-with-predictions``
    (:mod:`plumekit.label.ranking`), or None with a warning when the
    granule has no saved prediction — the queue then falls back to file
    order rather than failing the whole export."""
    from plumekit.label import load_plume_masks, load_prediction, \
        plume_support

    pred_dir = args.rank_with_predictions or paths.resolve("predictions_dir")
    probs = load_prediction(pred_dir, base)
    if probs is None:
        logger.warning(
            "%s: no prediction in %s — review queue stays in file order "
            "(run predict_model first to rank it)", base, pred_dir)
        return None
    masks = load_plume_masks(paths.resolve("plume_mask_dir"), base)
    try:
        return plume_support(probs, hull_df, masks)
    except Exception as e:
        # a stale prediction (wrong granule size) or malformed artifact
        # must not abort the whole export — this granule just stays in
        # file order
        logger.warning("%s: scoring failed (%s: %s) — review queue stays "
                       "in file order", base, type(e).__name__, e)
        return None


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="plumekit",
                                description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("make_dataset", help="generate granules + fire CSV")
    _add_root(d)
    d.add_argument("--n-granules", type=int, default=4)
    d.add_argument("--size", type=int, default=512)
    d.add_argument("--plumes", type=int, default=4)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--viirs-swaths", type=int, default=0,
                   help="also write N synthetic VIIRS SDR swaths "
                        "(raw/viirs/sdr, reference filepaths.py:13)")
    d.add_argument("--viirs-aod-pairs", type=int, default=0,
                   help="also write N synthetic IVAOT/GMTCO h5 pairs "
                        "(raw/viirs/{aod,geo}, reference filepaths.py:21-22)")
    d.set_defaults(fn=cmd_make_dataset)

    rv = sub.add_parser("resample_viirs",
                        help="reproject SDR swaths to UTM grids "
                             "(raw/reprojected_viirs)")
    _add_root(rv)
    rv.add_argument("--pixel-size", type=float, default=750.0,
                    help="UTM grid pixel size in meters")
    rv.add_argument("--radius", type=float, default=10000.0,
                    help="radius of influence in meters (tools.py:57)")
    rv.add_argument("--quicklooks", action="store_true",
                    help="also write blue/tcc PNGs (filepaths.py:14-15)")
    rv.set_defaults(fn=cmd_resample_viirs)

    iv = sub.add_parser("identify_viirs",
                        help="notebook workflow: IVAOT/GMTCO AOD pairs → "
                             "UTM resample → basic identify → plume masks")
    _add_root(iv)
    iv.add_argument("--fires", default=None,
                    help="FIRMS fire CSV (defaults to "
                         "raw/fires/fires_viirs_aod.csv)")
    iv.add_argument("--pixel-size", type=float, default=750.0,
                    help="UTM grid pixel size in meters (notebook cell 10)")
    iv.set_defaults(fn=cmd_identify_viirs)

    f = sub.add_parser("build_features", help="batch identify → CSVs")
    _add_root(f)
    f.add_argument("--detector", choices=["rg", "gaussian", "basic"],
                   default="rg")
    f.add_argument("--plot", action="store_true",
                   help="write annotated scene PNGs (reference main() plots)")
    f.add_argument("--no-masks", action="store_true",
                   help="skip the per-plume device-mask npz (rg detector; "
                        "reference-parity hull-only artifacts)")
    f.add_argument("--batch-scenes", type=int, default=1,
                   help="same-shape scenes identified per dispatched "
                        "program (rg detector; amortises the fixed "
                        "dispatch tax — 72.9→65.2 ms/scene at 8, "
                        "BASELINE.md round 3)")
    f.set_defaults(fn=cmd_build_features)

    pm = sub.add_parser("prepare_model_data",
                        help="curated hulls → model-ready training samples")
    _add_root(pm)
    pm.add_argument("--fires", default=None,
                    help="fire CSV (defaults to raw/fires/fires.csv)")
    pm.add_argument("--hulls-only", action="store_true",
                    help="rasterise convex hulls even when per-plume device "
                         "masks exist (the reference's exact curated "
                         "artifact; default prefers the sharper masks)")
    pm.add_argument("--uncurated", action="store_true",
                    help="use the FULL identify output (hull_df_dir) "
                         "instead of the curated reduced set — raw "
                         "weak-label training without human review")
    pm.set_defaults(fn=cmd_prepare_model_data)

    t = sub.add_parser("train_model", help="train the U-Net")
    _add_root(t)
    t.add_argument("--steps", type=int, default=200)
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--tile", type=int, default=256)
    t.add_argument("--granule-size", type=int, default=512)
    t.add_argument("--data-parallel", type=int, default=1)
    t.add_argument("--weak-labels", action="store_true",
                   help="label granules with the classical identify pipeline "
                        "instead of synthetic ground truth")
    t.add_argument("--curated", action="store_true",
                   help="train on curated samples from model_data_dir "
                        "(run prepare_model_data first)")
    t.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="optimizer steps scanned inside one dispatched "
                        "program (amortises the fixed per-program dispatch "
                        "latency; chunks never cross a log/eval/checkpoint "
                        "boundary)")
    t.add_argument("--quantize-transfer", action="store_true",
                   help="upload tile batches as uint16/uint8 and decode on "
                        "device (4 B/px instead of 12 over the transfer-"
                        "bound host->device hop; granules quantized once "
                        "up front)")
    t.add_argument("--device-data", action="store_true",
                   help="keep the WHOLE training set resident in HBM and "
                        "draw/augment tiles inside the scanned step program "
                        "— no per-step host->device payload at all (pair "
                        "with --steps-per-dispatch; with "
                        "--quantize-transfer the HBM copy stores uint16/"
                        "uint8, 3x the granules per byte)")
    t.add_argument("--arch", choices=["unet", "unetpp"], default="unet",
                   help="architecture family (unetpp = nested dense skips, "
                        "arXiv:1807.10165); persisted next to checkpoints "
                        "so predict/export/evaluate rebuild it")
    t.add_argument("--deep-supervision", action="store_true",
                   help="unetpp only: average the per-column side heads")
    t.add_argument("--distill-from", default=None, metavar="CKPT_DIR",
                   help="offline knowledge distillation: re-label the "
                        "training granules with this checkpoint's soft "
                        "probabilities before training (one amortised "
                        "sliding-infer pass per granule; the dev set keeps "
                        "its original labels)")
    t.add_argument("--distill-alpha", type=float, default=1.0,
                   help="teacher blend weight: y' = a*p_teacher + (1-a)*y "
                        "(default 1.0 = pure teacher labels — the measured "
                        "best, BASELINE.md distillation row)")
    t.add_argument("--distill-temp", type=float, default=1.0,
                   help="teacher logits are divided by T before the "
                        "sigmoid (T > 1 softens the soft labels)")
    t.add_argument("--distill-prune-level", type=int, default=None,
                   help="serve a UNet++ deep-supervision teacher pruned at "
                        "this fusion column (see predict --prune-level)")
    t.add_argument("--distill-tta", action="store_true",
                   help="D4-average the teacher's soft labels (8 views in "
                        "one folded forward) — offline ensemble denoising "
                        "of the targets")
    t.add_argument("--distill-calibrate", nargs="?", const="auto",
                   default=None, metavar="THRESH",
                   help="recenter teacher logits so its calibrated "
                        "operating point maps to 0.5; pass a threshold or "
                        "nothing to read <root>/models/threshold.json "
                        "(written by evaluate_model --write-threshold)")
    t.set_defaults(fn=cmd_train_model)

    def _add_serving_args(p):
        """Flags shared by predict_model (batch) and serve (continuous)."""
        _add_root(p)
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--tile", type=int, default=288)
        p.add_argument("--overlap", type=int, default=32,
                       help="blended tile overlap; 0 = disjoint fast tiling "
                            "(measured: ~0.07%% seam mask flips vs the "
                            "whole-image forward, docs/performance.md)")
        p.add_argument("--plot", action="store_true")
        p.add_argument("--fused", action="store_true",
                       help="Pallas fused conv+BN+ReLU forward (deep "
                            "levels)")
        p.add_argument("--int8", action="store_true",
                       help="int8 post-training-quantized forward (weights "
                            "+ activations on the MXU s8 path, 2x the bf16 "
                            "rate on v5e); calibrated on the first granule. "
                            "See models/quantized_forward.py")
        p.add_argument("--threshold", type=float, default=None,
                       help="mask decision threshold (default: the "
                            "calibrated <root>/models/threshold.json if "
                            "present — evaluate_model --sweep-threshold "
                            "--write-threshold — else 0.5)")
        p.add_argument("--tta", action="store_true",
                       help="D4 test-time augmentation: average plume "
                            "probabilities over the 8 rotation/flip views "
                            "of every tile, folded into one forward at 8x "
                            "the batch — the serving menu's "
                            "more-quality-for-more-compute dial (composes "
                            "with --int8/--prune-level; measured in "
                            "BASELINE.md). Consider lowering --batch-tiles "
                            "if memory is tight")
        p.add_argument("--batch-granules", type=int, default=2,
                       help="granules per dispatched program (same-shape "
                            "groups vmapped; the per-program dispatch tax "
                            "amortises across the group — measured +71%% "
                            "at G=2, BASELINE.md round 3; 1 = per-granule)")
        p.add_argument("--quantize", action="store_true",
                       help="uint16 host→HBM payloads with on-device "
                            "dequant (halves transfer bytes; pays when the "
                            "link, not the host, is the bottleneck)")
        p.add_argument("--quantize-output", action="store_true",
                       help="uint8/255 prob readback encoded on device "
                            "(quarters device→host bytes — the bigger "
                            "half of the measured transfer budget; probs "
                            "differ ≤ 1/510 from fp32)")
        p.add_argument("--exported", default=None,
                       help="serve an AOT-exported artifact dir (see "
                            "export_model) instead of tracing the live "
                            "model; granule geometry must match the export")
        p.add_argument("--prune-level", type=int, default=None,
                       help="UNet++ deep-supervision checkpoints only: "
                            "serve the nested grid truncated at fusion "
                            "column L (heads 1..L averaged) — the paper's "
                            "pruned-inference speed/quality dial; L=depth "
                            "is the full model")
        p.add_argument("--batch-tiles", type=int, default=64,
                       help="tiles per device forward (the measured "
                            "default; sweep with `plumekit tune`)")
        p.add_argument("--mesh-devices", type=int, default=0, metavar="D",
                       help="pod-slice serving: shard each granule group "
                            "over a D-device mesh (every device runs its "
                            "--batch-granules granules' tile grids in one "
                            "program — the tested config-5 DP shape). "
                            "D = -1 uses every visible device; groups are "
                            "D × --batch-granules granules; params "
                            "replicate, no collectives. Incompatible with "
                            "--exported/--fused")
        p.add_argument("--tuned", nargs="?", const="auto", default=None,
                       metavar="JSON",
                       help="serve the geometry measured by `plumekit "
                            "tune` (bare flag reads <root>/models/"
                            "tuned_geometry.json); overrides --tile/"
                            "--overlap/--batch-tiles/--batch-granules")

    pr = sub.add_parser("predict_model", help="sliding-window inference")
    _add_serving_args(pr)
    pr.set_defaults(fn=cmd_predict_model)

    sv = sub.add_parser("serve",
                        help="continuous serving: watch the granule dir, "
                             "predict new arrivals, resume-idempotent "
                             "(generalises the reference's processed-file-"
                             "log rerun loop, plume_identifier_rg.py:"
                             "537-576)")
    _add_serving_args(sv)
    sv.add_argument("--poll", type=float, default=10.0,
                    help="seconds between directory scans")
    sv.add_argument("--once", action="store_true",
                    help="serve the current backlog and exit (one scan)")
    sv.add_argument("--idle-exit", type=int, default=0,
                    help="exit after N consecutive empty scans (0 = run "
                         "until signalled)")
    sv.add_argument("--max-cycles", type=int, default=0,
                    help="hard bound on scan cycles (0 = unbounded)")
    sv.add_argument("--settle", type=float, default=2.0,
                    help="skip files whose mtime is younger than this "
                         "(still-uploading guard)")
    sv.set_defaults(fn=cmd_serve)

    tn = sub.add_parser(
        "tune",
        help="measure candidate serving geometries (tile/overlap/"
             "batch_tiles × granules-per-program) on the attached device "
             "with the chained timing discipline and persist the winner "
             "for predict_model/serve --tuned")
    _add_root(tn)
    tn.add_argument("--checkpoint", default=None,
                    help="time this checkpoint's architecture (default: "
                         "<root>/models/checkpoints if present, else "
                         "untrained default weights — throughput does "
                         "not depend on weight values)")
    tn.add_argument("--int8", action="store_true",
                    help="time the int8 quantized forward (the shipped "
                         "serving default)")
    tn.add_argument("--prune-level", type=int, default=None,
                    help="time a UNet++ DS checkpoint truncated at "
                         "fusion column L (see predict --prune-level)")
    tn.add_argument("--granule", type=int, default=2048,
                    help="square granule size to tune at — use your "
                         "production granule geometry (the optimum is "
                         "size-dependent: small granules are "
                         "dispatch-bound)")
    tn.add_argument("--granules-per-program", default="1,2,4",
                    help="comma list of G values to sweep (granules "
                         "batched per dispatched program)")
    tn.add_argument("--candidates", default=None,
                    help="comma list of tile/overlap[/batch_tiles] "
                         "candidates (default: the BASELINE.md round-3 "
                         "sweep grid)")
    tn.add_argument("--repeats", type=int, default=3,
                    help="chained pipeline executions per timing sample")
    tn.add_argument("--tile-calib", type=int, default=288,
                    help="int8 calibration tile size (structure only)")
    tn.add_argument("--out", default=None,
                    help="artifact path (default <root>/models/"
                         "tuned_geometry.json)")
    tn.set_defaults(fn=cmd_tune)

    ex = sub.add_parser("export_model",
                        help="AOT-export inference to a serving artifact "
                             "(StableHLO via jax.export; no model code or "
                             "re-trace needed to serve)")
    _add_root(ex)
    ex.add_argument("--checkpoint", default=None)
    ex.add_argument("--granule", type=int, default=2048,
                    help="granule height (pixels); padded to 2**depth")
    ex.add_argument("--granule-width", type=int, default=None,
                    help="granule width if not square")
    ex.add_argument("--batch-granules", type=int, default=1,
                    help="granules per program (the round-3 dispatch-"
                         "amortisation lever; 4 is the measured 8192² "
                         "optimum on the tunneled v5e)")
    ex.add_argument("--tile", type=int, default=288)
    ex.add_argument("--overlap", type=int, default=32)
    ex.add_argument("--int8", action="store_true",
                    help="export the int8 post-training-quantized program "
                         "(models/quantized_forward); the serving host "
                         "quantizes each restored checkpoint at load time, "
                         "so the artifact stays checkpoint-agnostic")
    ex.add_argument("--batch-tiles", type=int, default=64)
    ex.add_argument("--prune-level", type=int, default=None,
                    help="export the UNet++ grid truncated at fusion "
                         "column L (deep-supervision checkpoints; see "
                         "predict_model --prune-level)")
    ex.add_argument("--threshold", type=float, default=None,
                    help="mask threshold baked into the program (default: "
                         "the calibrated models/threshold.json if present, "
                         "else 0.5)")
    ex.add_argument("--tta", action="store_true",
                    help="bake D4 test-time augmentation into the exported "
                         "program (8 views per tile, one folded forward; "
                         "see predict_model --tta)")
    ex.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering targets (export once, "
                         "serve on any listed backend)")
    ex.add_argument("--out", default=None,
                    help="artifact dir (default <root>/models/exported)")
    ex.set_defaults(fn=cmd_export_model)

    ev = sub.add_parser("evaluate_model",
                        help="score a checkpoint or saved predictions "
                             "against model-ready labels (IoU/dice/"
                             "precision/recall per sample + pooled)")
    _add_root(ev)
    ev.add_argument("--checkpoint", default=None)
    ev.add_argument("--data", default=None,
                    help="model-data dir (default <root>'s model_data_dir; "
                         "written by prepare_model_data)")
    ev.add_argument("--predictions", default=None,
                    help="score existing predict_model NPZs from this dir "
                         "instead of running inference")
    ev.add_argument("--tile", type=int, default=288)
    ev.add_argument("--overlap", type=int, default=32)
    ev.add_argument("--threshold", type=float, default=0.5)
    ev.add_argument("--sweep-threshold", nargs="?", const="iou",
                    default=None, metavar="METRIC",
                    help="sweep the decision threshold 0.05..0.95 and "
                         "report the pooled-metric curve + the best "
                         "operating point (default metric iou; also "
                         "obj_precision/obj_recall/obj_f1 for PLUME-level "
                         "calibration — the pixel and plume optima "
                         "genuinely differ, BASELINE.md; writes "
                         "threshold_sweep.csv next to the report)")
    ev.add_argument("--write-threshold", action="store_true",
                    help="persist the swept best threshold to <root>/"
                         "models/threshold.json — predict_model/serve/"
                         "export_model then serve it automatically "
                         "(explicit --threshold overrides)")
    ev.add_argument("--objects", action="store_true",
                    help="plume-LEVEL detection metrics instead of pixel "
                         "metrics: connected components matched one-to-one "
                         "by IoU (>= --match-iou), pooled "
                         "precision/recall/F1 — how many plumes were "
                         "found/missed/invented")
    ev.add_argument("--match-iou", type=float, default=0.5,
                    help="component-match IoU for --objects (detection "
                         "convention)")
    ev.add_argument("--min-size", type=int, default=1,
                    help="detection noise floor in pixels (the reference "
                         "gates regions < 100 px): predicted components "
                         "below it are pruned; true components below it "
                         "are IGNORED — neither missed nor matchable")
    ev.add_argument("--bootstrap", type=int, nargs="?", const=1000,
                    default=0, metavar="N",
                    help="add scene-level bootstrap 95%% confidence "
                         "intervals for the pooled metrics (N resamples, "
                         "default 1000) — quantifies the protocol's "
                         "sampling variance instead of the informal "
                         "±0.02 caveat; works with --objects too")
    ev.add_argument("--prune-level", type=int, default=None,
                    help="evaluate the UNet++ grid truncated at fusion "
                         "column L (see predict_model --prune-level)")
    ev.add_argument("--out", default=None,
                    help="report CSV (default <root>/processed/"
                         "evaluation.csv)")
    ev.set_defaults(fn=cmd_evaluate_model)

    i = sub.add_parser("identify", help="identify plumes in one granule")
    i.add_argument("granule")
    i.add_argument("fires")
    i.add_argument("--detector", choices=["rg", "gaussian", "basic"],
                   default="rg")
    i.add_argument("--out", default=None)
    i.set_defaults(fn=cmd_identify)

    vg = sub.add_parser(
        "verify_real_granule",
        help="run one granule file through the real-data contract "
             "register (docs/parity.md): named-error decode, grid/value/"
             "UTM-resample sanity, optional detector smoke run; exit 0 "
             "iff every non-skipped check passes")
    vg.add_argument("granule", help="granule file (.hdf/.h5/.npz)")
    vg.add_argument("--fires", default=None,
                    help="fire CSV for the detector smoke run (omitted = "
                         "identify check is skipped)")
    vg.add_argument("--detector", choices=["rg", "gaussian", "basic"],
                    default="rg")
    vg.add_argument("--no-identify", action="store_true",
                    help="skip the detector smoke run even with --fires")
    vg.set_defaults(fn=cmd_verify_real_granule)

    s = sub.add_parser("select", help="plume curation (review/decisions)")
    _add_root(s)
    s.add_argument("--decisions", default=None,
                   help="CSV with id,datetime,keep columns")
    s.add_argument("--rank-with-predictions", nargs="?", const="",
                   default=None, metavar="DIR",
                   help="order each review manifest most-suspect-first by "
                        "model support: mean predict_model probability "
                        "over each plume's pixels (bare flag reads "
                        "<root>/processed/predictions; see "
                        "plumekit.label.ranking — a model trained on the "
                        "weak labels disbelieves the mislabeled plumes "
                        "most, so a curation budget spent down this queue "
                        "removes more false plumes per decision)")
    s.set_defaults(fn=cmd_select)

    rp = sub.add_parser("report",
                        help="campaign summary markdown + figures under "
                             "<root>/reports/")
    _add_root(rp)
    rp.add_argument("--out", default=None,
                    help="report dir (default <root>/reports)")
    rp.set_defaults(fn=cmd_report)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    # honor JAX_PLATFORMS even where a sitecustomize force-registers a
    # PJRT plugin (the env var alone loses to programmatic registration;
    # jax.config wins) — JAX_PLATFORMS=cpu must mean CPU, not a ~25-min
    # hang on an unreachable tunneled backend
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
