#!/usr/bin/env python
"""plumekit end-to-end walkthrough (synthetic data, any backend).

Runs the full story in one process with tiny sizes:

  1. make a synthetic MAIAC-like granule + VIIRS-like fire table;
  2. classical identification (rg threshold sweep, one jitted XLA program);
  3. curation pre-pass (dedup + zero-bin auto-reject);
  4. weak-label U-Net training for a few steps;
  5. full-granule sliding-window inference + overlap-blend stitching;
  6. plots under ./demo_out/.

Usage: python examples/end_to_end.py   (~2-5 min first run: jit compiles)
"""

import os
import sys

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # honor an explicit CPU request BEFORE the first backend query: some
    # environments force-register an external TPU plugin that wins over
    # the env var alone (CLAUDE.md "environment quirks")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main() -> int:
    out_dir = "demo_out"
    os.makedirs(out_dir, exist_ok=True)

    from plumekit.config.identify import RGIdentifyConfig
    from plumekit.config.train import DataConfig, InferConfig, TrainConfig, UNetConfig
    from plumekit.identify.api import identify
    from plumekit.infer import make_sliding_infer, pad_to_multiple
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene
    from plumekit.label import review_plumes
    from plumekit.models import UNet
    from plumekit.train import (create_state, make_train_step,
                                make_weak_label_dataset, tile_batches)
    from plumekit.train.data import scene_to_sample
    from plumekit.viz import plot_identify_bboxes, plot_prediction

    print("1) synthetic granule + fires")
    scene = make_scene(SyntheticSceneConfig(
        size=256, n_plumes=3, seed=4243, background_level=0.2,
        background_noise=0.05, plume_amplitude=(0.6, 0.9),
        plume_sigma_major=(9.0, 16.0), plume_sigma_minor=(1.8, 2.8),
        fires_per_plume=(5, 8),
    ))
    print(f"   granule {scene.granule.shape}, {len(scene.fires)} fires")

    print("2) classical identification (rg sweep on device)")
    cfg = RGIdentifyConfig(max_fires=16)
    ps = identify(scene.granule, scene.fires,
                  scene.fires.date_time.iloc[0], cfg)
    print(f"   {len(ps)} plumes accepted")
    if len(ps.aod_stats):
        plot_identify_bboxes(scene.granule.first_layer(), ps.aod_stats,
                             os.path.join(out_dir, "identify.png"))

    print("3) curation pre-pass")
    if len(ps.hulls):
        hulls = ps.hulls.copy()
        hulls["datetime"] = next(iter(scene.granule.layers))
        reviews = review_plumes(hulls, scene.granule)
        kept = sum(not r.auto_rejected for r in reviews)
        print(f"   {kept}/{len(reviews)} plumes pass the auto-reject rule")

    print("4) weak-label training (few steps)")
    ucfg = UNetConfig(base_features=8, depth=2, compute_dtype="float32")
    tcfg = TrainConfig(batch_size=4, tile_size=64, total_steps=20,
                       warmup_steps=3, augment=True)
    samples = make_weak_label_dataset(
        DataConfig(granule_size=256, n_train_granules=2, seed=4243),
        train=True, identify_cfg=cfg,
    )
    state = create_state(jax.random.PRNGKey(0), ucfg, tcfg)
    step = make_train_step(augment=True)
    batches = tile_batches(samples, 64, 4, np.random.default_rng(0))
    for i in range(tcfg.total_steps):
        xs, ys = next(batches)
        state, metrics = step(state, jnp.asarray(xs), jnp.asarray(ys),
                              jax.random.PRNGKey(i))
    print(f"   loss {float(metrics['loss']):.3f} "
          f"IoU {float(metrics['iou']):.3f}")

    print("5) full-granule sliding-window inference")
    model = UNet(ucfg)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    infer = make_sliding_infer(
        model.apply, InferConfig(tile_size=64, overlap=16, batch_tiles=8),
        channels=2,
    )
    channels = scene_to_sample(scene).channels
    padded, (h, w) = pad_to_multiple(channels, 2**ucfg.depth)
    probs, mask = infer(variables, jnp.asarray(padded))
    probs = np.asarray(probs)[:h, :w]
    print(f"   {100 * (probs > 0.5).mean():.1f}% pixels flagged as plume "
          "(20 demo steps — train for real with `plumekit train_model`; "
          "see BASELINE.md for measured quality)")
    plot_prediction(channels[..., 0], probs,
                    os.path.join(out_dir, "prediction.png"))

    print("6) evaluation (pooled + per-sample confusion metrics)")
    from plumekit.train.evaluate import _score_rows

    gt = scene_to_sample(scene).mask.astype(bool)
    table = _score_rows([("demo_granule", probs > 0.5, gt)])
    micro = table[table.name == "micro"].iloc[0]
    print(f"   vs ground truth: IoU {micro['iou']:.3f} "
          f"precision {micro['precision']:.3f} recall {micro['recall']:.3f} "
          "(workspace campaigns: `plumekit evaluate_model` / "
          "`plumekit report`)")
    print(f"done — artifacts in {out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
