"""D4 test-time augmentation (plumekit.infer.tta + --tta wiring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plumekit.infer.tta import make_tta_apply


def test_tta_exact_on_equivariant_apply():
    """For a D4-equivariant apply (logits = first input channel), every
    inverse-transformed view reproduces the same plane, so TTA must
    return it unchanged (proves the view/inverse pairing is correct —
    a wrong inverse would smear the plane across orientations)."""
    def apply_fn(variables, x, train=False):
        return x[..., :1]

    tta = make_tta_apply(apply_fn)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 16, 16, 2)).astype(np.float32))
    out = tta({}, x)
    assert out.shape == (3, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[..., :1]),
                               rtol=0, atol=1e-5)


def test_tta_is_mean_probability_over_views():
    """Against a hand-rolled reference: 8 separate forwards, inverse
    transforms, sigmoid-mean — the folded-batch implementation must
    match bit-for-bit up to fp."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(2, 1)).astype(np.float32))

    def apply_fn(variables, x, train=False):
        # orientation-SENSITIVE: logits mix a channel map with a
        # row-index ramp so every view genuinely differs
        ramp = jnp.arange(x.shape[1], dtype=jnp.float32)[None, :, None,
                                                         None]
        return x @ variables["w"] + 0.1 * ramp

    x = jnp.asarray(rng.normal(size=(2, 12, 12, 2)).astype(np.float32))
    got = jax.nn.sigmoid(make_tta_apply(apply_fn)({"w": w}, x))

    accum = []
    for f in (False, True):
        for k in range(4):
            v = jnp.flip(x, axis=2) if f else x
            v = jnp.rot90(v, k=k, axes=(1, 2)) if k else v
            y = apply_fn({"w": w}, v)
            y = jnp.rot90(y, k=-k, axes=(1, 2)) if k else y
            y = jnp.flip(y, axis=2) if f else y
            accum.append(jax.nn.sigmoid(y.astype(jnp.float32)))
    want = jnp.mean(jnp.stack(accum), axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_tta_rejects_non_square():
    tta = make_tta_apply(lambda v, x, train=False: x[..., :1])
    with pytest.raises(ValueError, match="square"):
        tta({}, jnp.zeros((1, 16, 8, 2)))


def test_tta_through_sliding_inference():
    """TTA wraps a real flax U-Net inside make_sliding_infer: probs stay
    in [0, 1] and the TTA canvas differs from (but correlates with) the
    plain one."""
    from plumekit.config.train import InferConfig, UNetConfig
    from plumekit.infer import make_sliding_infer
    from plumekit.models import build_model

    cfg = UNetConfig(base_features=4, depth=2)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)),
                           train=False)
    icfg = InferConfig(tile_size=32, overlap=8, batch_tiles=4)
    image = jnp.asarray(np.random.default_rng(2).random(
        (64, 64, 2), np.float32))
    plain, _ = make_sliding_infer(model.apply, icfg, channels=2)(
        variables, image)
    ttap, _ = make_sliding_infer(make_tta_apply(model.apply), icfg,
                                 channels=2)(variables, image)
    plain, ttap = np.asarray(plain), np.asarray(ttap)
    assert ttap.shape == plain.shape
    assert np.isfinite(ttap).all()
    assert (ttap >= 0).all() and (ttap <= 1).all()
    assert not np.allclose(ttap, plain)    # untrained net is not D4-equiv


def test_cli_predict_tta(tmp_path):
    """predict_model --tta end to end (and --tta --exported is a usage
    error, not a crash)."""
    from plumekit.cli import main

    root = str(tmp_path)
    assert main(["make_dataset", "--root", root, "--n-granules", "1",
                 "--size", "128", "--plumes", "2"]) == 0
    assert main(["predict_model", "--root", root, "--tile", "64",
                 "--batch-tiles", "8", "--tta"]) == 0
    preds = list((tmp_path / "processed/predictions").glob("*_pred.npz"))
    assert len(preds) == 1
    probs = np.load(preds[0])["probs"]
    assert probs.shape == (128, 128) and np.isfinite(probs).all()

    assert main(["predict_model", "--root", root, "--tta",
                 "--exported", "whatever"]) == 1


def test_tta_export_roundtrip():
    """export_model --tta bakes the D4 forward into the artifact: the
    exported program's output matches the live TTA program exactly."""
    from plumekit.config.train import InferConfig, UNetConfig
    from plumekit.infer import make_sliding_infer
    from plumekit.infer.export import export_sliding_infer
    from plumekit.models import build_model

    cfg = UNetConfig(base_features=4, depth=2)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)),
                           train=False)
    icfg = InferConfig(tile_size=32, overlap=8, batch_tiles=4)
    exported, meta = export_sliding_infer(
        variables, cfg, icfg, (64, 64), platforms=["cpu"], tta=True)
    assert meta["tta"] is True

    image = jnp.asarray(np.random.default_rng(3).random(
        (64, 64, 2), np.float32))
    live_probs, live_mask = make_sliding_infer(
        make_tta_apply(model.apply), icfg, channels=2)(variables, image)
    exp_probs, exp_mask = exported.call(variables, image)
    np.testing.assert_allclose(np.asarray(exp_probs),
                               np.asarray(live_probs), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(exp_mask),
                                  np.asarray(live_mask))
