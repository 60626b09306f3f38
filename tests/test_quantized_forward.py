"""Int8 post-training-quantized inference vs the fp32 forward.

Contract (models/quantized_forward.py): on trained weights the int8
forward's MASK disagrees with fp32 in the same band as the documented
stitching seam cost (docs/performance.md, ~0.1% flips) — quantization must
not become the serving pipeline's dominant error source."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plumekit.config.train import InferConfig, TrainConfig, UNetConfig
from plumekit.models import UNet
from plumekit.models.quantized_forward import (
    calibrate_unet,
    make_quantized_apply,
    quantize_unet,
)

CFG = UNetConfig(in_channels=2, base_features=8, depth=2,
                 compute_dtype="float32")


def _init_variables(cfg, key=0, shape=(2, 32, 32, 2)):
    model = UNet(cfg)
    x = jnp.zeros(shape, jnp.float32)
    v = model.init(jax.random.PRNGKey(key), x, train=False)
    # nontrivial running stats so BN folding is exercised
    return jax.tree.map(
        lambda a: a + 0.03 * jnp.arange(a.size, dtype=a.dtype).reshape(
            a.shape) if a.ndim == 1 else a, v)


def _trained_variables(cfg, steps=40):
    """Quickly fit mask = channel0 > 0.5 so logits are decisive (random
    weights hover at the threshold and any rounding flips masks — not the
    serving regime quantization targets)."""
    from plumekit.train import create_state, make_train_step

    state = create_state(jax.random.PRNGKey(0), cfg,
                         TrainConfig(batch_size=4, tile_size=32,
                                     warmup_steps=5, learning_rate=3e-3))
    step = make_train_step(dice_weight=0.5, augment=False)
    rng = np.random.default_rng(0)
    xs = rng.random((4, 32, 32, 2)).astype(np.float32)
    ys = (xs[..., :1] > 0.5).astype(np.float32)
    for i in range(steps):
        state, metrics = step(state, jnp.asarray(xs), jnp.asarray(ys),
                              jax.random.PRNGKey(i))
    assert float(metrics["iou"]) > 0.6
    return ({"params": state.params, "batch_stats": state.batch_stats},
            xs, ys)


def test_quantized_logits_track_fp32():
    variables = _init_variables(CFG)
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.random((4, 32, 32, 2), np.float32))
    x = jnp.asarray(rng.random((2, 32, 32, 2), np.float32))

    ref = np.asarray(UNet(CFG).apply(variables, x, train=False)).ravel()
    qvars = quantize_unet(variables, CFG, calib)
    got = np.asarray(make_quantized_apply(CFG)(qvars, x)).ravel()

    assert np.corrcoef(got, ref)[0, 1] > 0.99
    span = ref.max() - ref.min()
    assert np.abs(got - ref).max() < 0.15 * span, (
        np.abs(got - ref).max(), span)


def test_quantized_mask_parity_on_trained_model():
    variables, xs, ys = _trained_variables(CFG)
    x = jnp.asarray(xs)
    ref_logits = UNet(CFG).apply(variables, x, train=False)
    qvars = quantize_unet(variables, CFG, calib=x)
    q_logits = make_quantized_apply(CFG)(qvars, x)

    ref_mask = np.asarray(ref_logits) > 0.0
    q_mask = np.asarray(q_logits) > 0.0
    flip = (ref_mask != q_mask).mean()
    assert flip < 5e-3, f"mask flip rate {flip:.4%}"

    # and quantization costs (essentially) no task quality vs fp32
    def task_iou(mask):
        gt = ys[..., 0] > 0.5
        m = mask[..., 0]
        return (m & gt).sum() / max(1, (m | gt).sum())

    assert task_iou(q_mask) >= task_iou(ref_mask) - 0.01


def test_quantized_weights_are_int8_and_once_rounded():
    """Every conv/transposed-conv weight ships as int8; activation scales
    are scalars; the last decoder output stays un-quantized (fp head)."""
    variables = _init_variables(CFG)
    calib = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 2),
                                                        np.float32))
    qvars = quantize_unet(variables, CFG, calib)
    for blk in qvars["blocks"]:
        assert blk["wq1"].dtype == jnp.int8 and blk["wq2"].dtype == jnp.int8
    for up in qvars["ups"]:
        assert up["kq"].dtype == jnp.int8
    assert qvars["blocks"][-1]["s_out"] is None
    assert qvars["head"]["kernel"].dtype == jnp.float32
    amax = calibrate_unet(variables, CFG, calib)
    # one scale per encoder output serves both consumers (pool + concat)
    assert "b0_out" in amax and "b1_out" in amax and "up0" in amax


def test_quantized_apply_under_sliding_infer():
    """Drop-in apply_fn: the int8 forward slots into make_sliding_infer and
    the stitched masks match the fp32 pipeline's."""
    from plumekit.infer import make_sliding_infer

    variables, _xs, _ys = _trained_variables(CFG)
    rng = np.random.default_rng(3)
    image = rng.random((96, 96, 2)).astype(np.float32)
    icfg = InferConfig(tile_size=32, overlap=8, batch_tiles=4)

    ref_infer = make_sliding_infer(UNet(CFG).apply, icfg, channels=2)
    ref_probs, ref_mask = ref_infer(variables, jnp.asarray(image))

    calib = jnp.asarray(image[None, :32, :32, :])
    qvars = quantize_unet(variables, CFG, calib)
    q_infer = make_sliding_infer(make_quantized_apply(CFG), icfg, channels=2)
    q_probs, q_mask = q_infer(qvars, jnp.asarray(image))

    assert q_probs.shape == ref_probs.shape
    flip = (np.asarray(ref_mask) != np.asarray(q_mask)).mean()
    assert flip < 1e-2, f"stitched mask flip rate {flip:.4%}"


def test_predict_cli_int8(tmp_path):
    """predict_model --int8 end-to-end: calibrates on the first granule and
    writes valid probability NPZs through the streaming pipeline."""
    from plumekit.cli import main

    root = str(tmp_path)
    assert main(["make_dataset", "--root", root, "--n-granules", "2",
                 "--size", "128", "--plumes", "2"]) == 0
    assert main(["predict_model", "--root", root, "--tile", "64",
                 "--int8"]) == 0
    preds = sorted((tmp_path / "processed/predictions").glob("*_pred.npz"))
    assert len(preds) == 2
    probs = np.load(preds[0])["probs"]
    assert probs.shape == (128, 128)
    assert np.isfinite(probs).all() and 0.0 <= probs.min() <= probs.max() <= 1.0

    # exclusive-flag guards
    assert main(["predict_model", "--root", root, "--tile", "64",
                 "--int8", "--fused"]) == 1


def test_cli_export_int8_then_predict(tmp_path):
    """export_model --int8 → predict_model --exported: the artifact
    self-describes as int8 (meta), the serving side quantizes the restored
    checkpoint at load, and outputs match the live --int8 predict."""
    import os

    from plumekit.cli import main as cli_main
    from plumekit.config.paths import PathsConfig
    from plumekit.io.granule import Granule, save_granule

    root = str(tmp_path)
    paths = PathsConfig(root=root)
    mdir = paths.ensure("maiac_dir")
    rng = np.random.default_rng(5)
    for i in range(2):
        aod = rng.random((96, 96)).astype(np.float32)
        g = Granule(name=f"s{i}", lat=np.zeros((96, 96)),
                    lon=np.zeros((96, 96)), layers={"t0": aod})
        save_granule(os.path.join(mdir, f"s{i}.npz"), g)

    art = str(tmp_path / "artifact")
    assert cli_main(["export_model", "--root", root, "--granule", "96",
                     "--batch-granules", "2", "--tile", "64",
                     "--overlap", "32", "--batch-tiles", "4",
                     "--platforms", "cpu", "--out", art]) == 0
    import json

    meta = json.load(open(os.path.join(art, "meta.json")))
    assert meta["forward"] == "flax"
    # fp artifact + --int8 must refuse (program expects the fp tree)
    assert cli_main(["predict_model", "--root", root, "--exported", art,
                     "--int8"]) == 1

    art8 = str(tmp_path / "artifact_int8")
    assert cli_main(["export_model", "--root", root, "--granule", "96",
                     "--batch-granules", "2", "--tile", "64",
                     "--overlap", "32", "--batch-tiles", "4", "--int8",
                     "--platforms", "cpu", "--out", art8]) == 0
    assert json.load(open(os.path.join(art8, "meta.json")))["forward"] \
        == "int8"

    pred_dir = os.path.join(root, "processed", "predictions")
    assert cli_main(["predict_model", "--root", root, "--tile", "64",
                     "--int8"]) == 0
    live = {f: np.load(os.path.join(pred_dir, f))["probs"]
            for f in sorted(os.listdir(pred_dir)) if f.endswith(".npz")}
    for f in os.listdir(pred_dir):
        os.remove(os.path.join(pred_dir, f))
    assert cli_main(["predict_model", "--root", root,
                     "--exported", art8]) == 0
    served = {f: np.load(os.path.join(pred_dir, f))["probs"]
              for f in sorted(os.listdir(pred_dir)) if f.endswith(".npz")}
    assert set(served) == set(live) == {"s0_pred.npz", "s1_pred.npz"}
    for f in live:
        np.testing.assert_allclose(served[f], live[f], atol=1e-6)


def test_quantized_sharded_batch_infer_matches_unsharded():
    """config-5 composition: the int8 forward under make_batch_infer_sharded
    (granule stack sharded over the 8-device mesh, qvars replicated) is
    bit-identical to the single-device int8 path — int8 inference scales
    over the pod axis like the fp path does."""
    from plumekit.config.train import MeshConfig
    from plumekit.infer.sliding import (make_batch_infer_sharded,
                                        make_sliding_infer)
    from plumekit.parallel import make_mesh

    variables = _init_variables(CFG)
    rng = np.random.default_rng(7)
    calib = jnp.asarray(rng.random((2, 32, 32, 2), np.float32))
    qvars = quantize_unet(variables, CFG, calib)
    images = jnp.asarray(rng.random((8, 64, 64, 2), np.float32))
    icfg = InferConfig(tile_size=32, overlap=8, batch_tiles=4)
    apply_fn = make_quantized_apply(CFG)

    single = make_sliding_infer(apply_fn, icfg, channels=2)
    ref = np.stack([np.asarray(single(qvars, im)[0]) for im in images])

    mesh = make_mesh(MeshConfig(data=8))
    sharded = make_batch_infer_sharded(apply_fn, mesh, icfg, channels=2)
    probs, masks = sharded(qvars, images)
    np.testing.assert_array_equal(np.asarray(probs), ref)
    assert masks.shape == (8, 64, 64)


def test_predict_cli_int8_skips_all_null_calibration_granule(tmp_path):
    """An all-null first granule must not collapse the calibration scales:
    the CLI skips it (warning), calibrates on the next granule with
    signal, and still predicts BOTH granules; with no usable granule at
    all it refuses instead of serving garbage."""
    import os

    from plumekit.cli import main as cli_main
    from plumekit.config.paths import PathsConfig
    from plumekit.io.granule import NULL_VALUE, Granule, save_granule

    root = str(tmp_path)
    mdir = PathsConfig(root=root).ensure("maiac_dir")
    shape = (96, 96)
    null = np.full(shape, NULL_VALUE, np.float32)
    save_granule(os.path.join(mdir, "a_null.npz"),
                 Granule(name="a_null", lat=np.zeros(shape),
                         lon=np.zeros(shape), layers={"t0": null}))
    real = np.random.default_rng(9).random(shape).astype(np.float32)
    save_granule(os.path.join(mdir, "b_real.npz"),
                 Granule(name="b_real", lat=np.zeros(shape),
                         lon=np.zeros(shape), layers={"t0": real}))

    assert cli_main(["predict_model", "--root", root, "--tile", "64",
                     "--int8"]) == 0
    pred_dir = tmp_path / "processed/predictions"
    assert {p.name for p in pred_dir.glob("*_pred.npz")} == \
        {"a_null_pred.npz", "b_real_pred.npz"}

    # all granules null → refuse
    for f in pred_dir.glob("*"):
        f.unlink()
    os.remove(os.path.join(mdir, "b_real.npz"))
    assert cli_main(["predict_model", "--root", root, "--tile", "64",
                     "--int8"]) == 1
    assert not list(pred_dir.glob("*_pred.npz"))


@pytest.mark.parametrize("deep", [False, True])
def test_quantized_unetpp_tracks_fp32(deep):
    """The UNet++ int8 scale graph (multi-way dense concats, each
    participant keeping its own scale; per-column side heads reading the
    pre-quantization fp outputs) tracks the flax forward like the U-Net
    path does — with and without deep supervision."""
    from plumekit.models import build_model

    cfg = UNetConfig(arch="unetpp", in_channels=2, base_features=8,
                     depth=2, compute_dtype="float32",
                     deep_supervision=deep)
    model = build_model(cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, 32, 32, 2), np.float32))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    variables = jax.tree.map(
        lambda a: a + 0.03 * jnp.arange(a.size, dtype=a.dtype).reshape(
            a.shape) if a.ndim == 1 else a, variables)

    ref = np.asarray(model.apply(variables, x, train=False)).ravel()
    qvars = quantize_unet(variables, cfg, x)
    got = np.asarray(make_quantized_apply(cfg)(qvars, x)).ravel()
    assert np.corrcoef(got, ref)[0, 1] > 0.99
    span = ref.max() - ref.min()
    assert np.abs(got - ref).max() < 0.15 * span, (
        np.abs(got - ref).max(), span)


def test_quantized_unetpp_mask_parity_trained():
    """Trained UNet++ (the measured quality pick): int8 serving keeps the
    masks and the task IoU."""
    cfg = UNetConfig(arch="unetpp", in_channels=2, base_features=8,
                     depth=2, compute_dtype="float32",
                     deep_supervision=True)
    variables, xs, ys = _trained_variables(cfg)
    from plumekit.models import build_model

    x = jnp.asarray(xs)
    ref_logits = build_model(cfg).apply(variables, x, train=False)
    qvars = quantize_unet(variables, cfg, calib=x)
    q_logits = make_quantized_apply(cfg)(qvars, x)
    ref_mask = np.asarray(ref_logits) > 0.0
    q_mask = np.asarray(q_logits) > 0.0
    flip = (ref_mask != q_mask).mean()
    assert flip < 5e-3, f"mask flip rate {flip:.4%}"


def test_quantized_guards():
    with pytest.raises(ValueError, match="arch"):
        make_quantized_apply(UNetConfig(arch="nonsense"))
    with pytest.raises(ValueError, match="batch"):
        make_quantized_apply(UNetConfig(norm="group"))
    variables = _init_variables(CFG)
    calib = jnp.zeros((1, 32, 32, 2), jnp.float32)
    qvars = quantize_unet(variables, CFG, calib)
    with pytest.raises(ValueError, match="inference-only"):
        make_quantized_apply(CFG)(qvars, calib, train=True)


@pytest.mark.parametrize("arch,deep", [("unet", False), ("unetpp", True)])
def test_quantized_vmap_folds_into_batch_exactly(arch, deep):
    """vmap over a granule axis must equal the per-granule loop.

    The quantized apply carries a custom_vmap rule that folds the mapped
    axis into the tile batch (measured on TPU: default batching of the s8
    ops runs 2.9x slower than the flat batch and loses to bf16 —
    experiments/int8_vmap_probe.py). The forward is per-sample, so the
    fold is the identity on values WITHIN one compiled program; across
    the two separately compiled programs compared here (batch G·B vs
    batch B) XLA may fuse the fp32 dequant epilogues into FMAs
    differently, and a half-ulp difference at a requant boundary moves
    one int8 step (~2e-4 observed on the UNet++ grid) — so the bound is
    one requant LSB, not bitwise. Covers make_multi_granule_infer /
    make_batch_infer_sharded's vmap structure.
    """
    if arch == "unet":
        cfg = CFG
        variables = _init_variables(cfg)
    else:
        from plumekit.models import build_model

        cfg = UNetConfig(arch="unetpp", in_channels=2, base_features=8,
                         depth=2, compute_dtype="float32",
                         deep_supervision=deep)
        x0 = jnp.zeros((2, 32, 32, 2), jnp.float32)
        variables = build_model(cfg).init(jax.random.PRNGKey(1), x0,
                                          train=False)
        variables = jax.tree.map(
            lambda a: a + 0.03 * jnp.arange(a.size, dtype=a.dtype).reshape(
                a.shape) if a.ndim == 1 else a, variables)
    rng = np.random.default_rng(7)
    calib = jnp.asarray(rng.random((2, 32, 32, 2), np.float32))
    qvars = quantize_unet(variables, cfg, calib)
    apply = make_quantized_apply(cfg)

    xg = jnp.asarray(rng.random((3, 2, 32, 32, 2), np.float32))
    vm = jax.jit(jax.vmap(lambda t: apply(qvars, t)))(xg)
    japply = jax.jit(lambda q, t: apply(q, t))
    loop = np.stack([np.asarray(japply(qvars, xg[g])) for g in range(3)])
    np.testing.assert_allclose(np.asarray(vm), loop, rtol=0, atol=2e-3)

    # nested vmap keeps folding (rule re-enters the wrapped fn)
    xgg = xg.reshape(3, 1, 2, 32, 32, 2)
    vm2 = jax.jit(jax.vmap(jax.vmap(lambda t: apply(qvars, t))))(xgg)
    np.testing.assert_allclose(np.asarray(vm2).reshape(vm.shape),
                               np.asarray(vm), rtol=0, atol=2e-3)

    # the fold really engaged: every conv in the batched program sees a
    # flat 4-D (G·B, h, w, c) operand — default batching would leave a
    # 5-D operand or fold G into a non-batch dim
    def walk(jaxpr, out):
        for e in jaxpr.eqns:
            if str(e.primitive) == "conv_general_dilated":
                out.append(e.invars[0].aval.shape)
            for v in e.params.values():
                leaves = v if isinstance(v, (list, tuple)) else [v]
                for leaf in leaves:
                    if hasattr(leaf, "jaxpr"):
                        walk(leaf.jaxpr, out)
        return out

    shapes = walk(jax.make_jaxpr(
        jax.vmap(lambda t: apply(qvars, t)))(xg).jaxpr, [])
    assert shapes, "expected conv_general_dilated in the batched jaxpr"
    for s in shapes:
        assert len(s) == 4 and s[0] % 6 == 0, s


@pytest.mark.parametrize("level", [1, 2])
def test_quantized_pruned_unetpp_tracks_fp32(level):
    """int8 serving of a PRUNED deep-supervised UNet++ (predict_model
    --int8 --prune-level): the truncated scale graph must track the
    truncated flax forward the way the full grid does."""
    import dataclasses

    from plumekit.models import build_model

    cfg = UNetConfig(arch="unetpp", in_channels=2, base_features=8,
                     depth=2, compute_dtype="float32",
                     deep_supervision=True)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((2, 32, 32, 2), np.float32))
    variables = build_model(cfg).init(jax.random.PRNGKey(2), x, train=False)
    pruned = dataclasses.replace(cfg, prune_level=level)
    ref = np.asarray(
        build_model(pruned).apply(variables, x, train=False)).ravel()
    qvars = quantize_unet(variables, pruned, x)
    got = np.asarray(make_quantized_apply(pruned)(qvars, x)).ravel()
    assert np.corrcoef(got, ref)[0, 1] > 0.99
    span = ref.max() - ref.min()
    assert np.abs(got - ref).max() < 0.15 * span
    if level == cfg.depth:
        # full-level pruning must quantize to the identical artifact
        full_q = quantize_unet(variables, cfg, x)
        flat_a = jax.tree.leaves(qvars)
        flat_b = jax.tree.leaves(full_q)
        assert len(flat_a) == len(flat_b)
        assert all((np.asarray(a) == np.asarray(b)).all()
                   for a, b in zip(flat_a, flat_b))
