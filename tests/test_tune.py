"""Serving-geometry autotuner: sweep, ranking, artifact, --tuned wiring.

The tuner re-measures the BASELINE.md geometry sweep on the attached
hardware (plumekit/infer/tune.py); these tests run it on the forced-CPU
backend with tiny geometries — ranking order is whatever the host
measures, so assertions pin structure (ranked, positive, failures last),
not which geometry wins.
"""

import json
import os
from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plumekit.config.train import UNetConfig
from plumekit.infer.tune import (TUNED_VERSION, Geometry, load_tuned,
                                 parse_candidates, save_tuned,
                                 tune_geometry)
from plumekit.models import build_model


def test_parse_candidates():
    geoms = parse_candidates("32/0,48/16/8", granules=(1, 2))
    assert Geometry(32, 0, 64, 1) in geoms
    assert Geometry(48, 16, 8, 2) in geoms
    assert len(geoms) == 4
    with pytest.raises(ValueError):
        parse_candidates("32/32")                 # overlap >= tile
    with pytest.raises(ValueError):
        parse_candidates("32")                    # malformed
    with pytest.raises(ValueError):
        parse_candidates("256/-32")               # gap stripes
    with pytest.raises(ValueError):
        parse_candidates("32/0/0")                # zero batch
    with pytest.raises(ValueError):
        parse_candidates("32/0", granules=(0,))   # zero G
    with pytest.raises(ValueError):
        parse_candidates("  ,")                   # empty


@pytest.fixture(scope="module")
def tiny_model():
    cfg = UNetConfig(base_features=4, depth=2)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 2)), train=False)
    return cfg, model, variables


def test_tune_geometry_ranks(tiny_model):
    cfg, model, variables = tiny_model
    geoms = parse_candidates("32/0/4,32/8/4", granules=(1, 2))
    payload = tune_geometry(model.apply, variables, cfg.in_channels,
                            granule=64, geoms=geoms, repeats=1)
    rates = [r["mpix_s"] for r in payload["results"]]
    assert len(rates) == 4 and all(v and v > 0 for v in rates)
    assert rates == sorted(rates, reverse=True)
    assert payload["best"] == payload["results"][0]
    assert payload["best_blended"]["overlap"] == 8
    assert payload["platform"] == "cpu"
    assert payload["version"] == TUNED_VERSION


def test_tune_geometry_failures_ranked_last(tiny_model, monkeypatch):
    import plumekit.infer.tune as tune_mod

    cfg, model, variables = tiny_model
    real = tune_mod.time_geometry

    def flaky(apply_fn, variables, stack, geom, channels, repeats=3):
        if geom.overlap == 8:
            raise RuntimeError("synthetic OOM")
        return real(apply_fn, variables, stack, geom, channels, repeats)

    monkeypatch.setattr(tune_mod, "time_geometry", flaky)
    geoms = parse_candidates("32/0/4,32/8/4")
    payload = tune_mod.tune_geometry(model.apply, variables,
                                     cfg.in_channels, 64, geoms, repeats=1)
    assert payload["best"]["overlap"] == 0
    failed = payload["results"][-1]
    assert failed["mpix_s"] is None and "synthetic OOM" in failed["error"]
    assert payload["best_blended"] is None   # the only blended one failed

    def always_fail(*a, **k):
        raise RuntimeError("nothing works")

    monkeypatch.setattr(tune_mod, "time_geometry", always_fail)
    with pytest.raises(RuntimeError, match="every candidate"):
        tune_mod.tune_geometry(model.apply, variables, cfg.in_channels,
                               64, geoms, repeats=1)


def test_save_load_tuned_roundtrip_and_validation(tmp_path):
    best = {"tile": 32, "overlap": 0, "batch_tiles": 4, "granules": 2,
            "mpix_s": 1.0}
    payload = {"version": TUNED_VERSION, "best": best, "results": [best]}
    p = str(tmp_path / "models" / "t.json")     # exercises the mkdir
    save_tuned(p, payload)
    assert load_tuned(p)["best"]["tile"] == 32
    assert not list((tmp_path / "models").glob("*.tmp"))

    save_tuned(p, dict(payload, version=99))
    with pytest.raises(ValueError, match="version"):
        load_tuned(p)
    save_tuned(p, {"version": TUNED_VERSION,
                   "best": {"tile": 32, "overlap": 0}})
    with pytest.raises(ValueError, match="malformed"):
        load_tuned(p)


def _write_artifact(root, tile=32, overlap=0, batch_tiles=4, granules=2):
    from plumekit.infer.tune import TUNED_BASENAME

    best = {"tile": tile, "overlap": overlap, "batch_tiles": batch_tiles,
            "granules": granules, "mpix_s": 123.0}
    path = os.path.join(root, "models", TUNED_BASENAME)
    save_tuned(path, {"version": TUNED_VERSION, "best": best,
                      "results": [best], "best_blended": None})
    return path


def test_apply_tuned_overrides_flags(tmp_path):
    from plumekit.cli import _apply_tuned, _CliError

    root = str(tmp_path)
    _write_artifact(root)
    args = Namespace(root=root, tuned="auto", exported=None, tile=288,
                     overlap=32, batch_tiles=64, batch_granules=1)
    _apply_tuned(args)
    assert (args.tile, args.overlap, args.batch_tiles,
            args.batch_granules) == (32, 0, 4, 2)

    # explicit path beats auto-resolution
    args = Namespace(root="/nonexistent", exported=None,
                     tuned=_write_artifact(root, tile=48),
                     tile=0, overlap=0, batch_tiles=0, batch_granules=0)
    _apply_tuned(args)
    assert args.tile == 48

    with pytest.raises(_CliError, match="mutually exclusive"):
        _apply_tuned(Namespace(root=root, tuned="auto",
                               exported="some/artifact"))
    with pytest.raises(_CliError, match="not found"):
        _apply_tuned(Namespace(root=str(tmp_path / "empty"), tuned="auto",
                               exported=None))


def test_cli_tune_then_tuned_predict(tmp_path):
    """End-to-end: tune writes the artifact, predict --tuned serves its
    geometry (untrained weights — geometry wiring is what's under test)."""
    from plumekit.cli import main as cli_main
    from plumekit.infer.tune import TUNED_BASENAME

    root = str(tmp_path)
    rc = cli_main(["tune", "--root", root, "--granule", "64",
                   "--candidates", "32/0/4", "--granules-per-program",
                   "1,2", "--repeats", "1"])
    assert rc == 0
    out = os.path.join(root, "models", TUNED_BASENAME)
    with open(out) as f:
        payload = json.load(f)
    assert payload["best"]["mpix_s"] > 0
    assert payload["best"]["tile"] == 32
    assert {r["granules"] for r in payload["results"]} == {1, 2}

    assert cli_main(["make_dataset", "--root", root, "--n-granules", "2",
                     "--size", "128", "--plumes", "2"]) == 0
    assert cli_main(["predict_model", "--root", root, "--tuned"]) == 0
    preds = sorted((tmp_path / "processed/predictions").glob("*_pred.npz"))
    assert len(preds) == 2
    probs = np.load(preds[0])["probs"]
    assert probs.shape == (128, 128)
    assert np.isfinite(probs).all()

    # --tuned + --exported is a usage error, not a crash
    assert cli_main(["predict_model", "--root", root, "--tuned",
                     "--exported", "whatever"]) == 1


def test_cli_tune_bad_candidates(tmp_path):
    from plumekit.cli import main as cli_main

    assert cli_main(["tune", "--root", str(tmp_path), "--granule", "64",
                     "--candidates", "32/64"]) == 1


def test_apply_tuned_warns_on_forward_mismatch(tmp_path, caplog):
    """An artifact measured for a different forward/architecture still
    applies but warns (the optimum is forward-dependent)."""
    import logging

    from plumekit.cli import _apply_tuned
    from plumekit.config.train import UNetConfig
    from plumekit.infer.tune import TUNED_BASENAME

    best = {"tile": 32, "overlap": 0, "batch_tiles": 4, "granules": 2,
            "mpix_s": 1.0}
    path = os.path.join(str(tmp_path), "models", TUNED_BASENAME)
    save_tuned(path, {"version": TUNED_VERSION, "best": best,
                      "results": [best], "best_blended": None,
                      "int8": True, "arch": "unet"})
    args = Namespace(root=str(tmp_path), tuned="auto", exported=None,
                     int8=False, tile=288, overlap=32, batch_tiles=64,
                     batch_granules=1)
    with caplog.at_level(logging.WARNING, logger="plumekit.cli"):
        _apply_tuned(args, UNetConfig(arch="unetpp"))
    text = caplog.text
    assert "int8=True" in text and "arch=unet" in text
    assert args.tile == 32          # still applied


def test_sliding_rejects_negative_overlap():
    from plumekit.config.train import InferConfig
    from plumekit.infer import make_sliding_infer

    with pytest.raises(ValueError, match="gap stripes"):
        make_sliding_infer(lambda v, x, train=False: x[..., :1],
                           InferConfig(tile_size=32, overlap=-8),
                           channels=2)


def test_cached_program_collectable_with_fn():
    """The per-infer_fn program cache must not outlive the function: the
    wrappers close over infer_fn, so a global registry would leak every
    compiled program (the WeakKeyDictionary value-references-key trap)."""
    import gc
    import weakref

    from plumekit.infer.streaming import _cached_program

    def infer_fn(v, x):
        return x, x

    built = _cached_program(infer_fn, ("k",), lambda: object())
    assert _cached_program(infer_fn, ("k",), lambda: object()) is built
    ref = weakref.ref(infer_fn)
    del infer_fn, built
    gc.collect()
    assert ref() is None
