"""InferConfig.emit="uint8": the serving epilogue in the readback codec
domain — canvas, threshold, and result at 1 byte/px (VERDICT round-3
weak #2). Encode must commute with assembly (exact vs the float path's
encoded output) and masks may flip only inside the 1/510 codec band."""

import numpy as np
import pytest

import jax

from plumekit.config.train import InferConfig, TrainConfig, UNetConfig
from plumekit.infer.sliding import make_multi_granule_infer, make_sliding_infer
from plumekit.models import build_model
from plumekit.train.state import create_state

CFG = UNetConfig(in_channels=2, base_features=8, depth=2,
                 compute_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    state = create_state(jax.random.PRNGKey(0), CFG,
                         TrainConfig(tile_size=32))
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    rng = np.random.default_rng(3)
    image = rng.random((96, 96, 2)).astype(np.float32)
    return build_model(CFG).apply, variables, image


@pytest.mark.parametrize("overlap", [0, 8], ids=["fast", "blend"])
def test_uint8_emit_matches_encoded_float(setup, overlap):
    apply_fn, variables, image = setup
    icfg = dict(tile_size=32, overlap=overlap, batch_tiles=4)
    inf_f = make_sliding_infer(apply_fn, InferConfig(**icfg), channels=2)
    inf_8 = make_sliding_infer(apply_fn, InferConfig(**icfg, emit="uint8"),
                               channels=2)
    pf, mf = inf_f(variables, image)
    p8, m8 = inf_8(variables, image)
    assert p8.dtype == np.uint8 and pf.dtype == np.float32
    # encode commutes with (taper-free or post-blend) assembly
    np.testing.assert_array_equal(
        np.asarray(p8), np.rint(np.asarray(pf) * 255.0).astype(np.uint8))
    # mask decisions agree outside the codec band around the threshold
    flips = np.asarray(m8) != np.asarray(mf)
    assert np.all(np.abs(np.asarray(pf)[flips] - 0.5) <= 1.0 / 510 + 1e-7)


def test_uint8_emit_multi_granule_and_threshold(setup):
    apply_fn, variables, image = setup
    icfg = InferConfig(tile_size=32, overlap=0, batch_tiles=4,
                       threshold=0.62, emit="uint8")
    minfer = make_multi_granule_infer(apply_fn, icfg, channels=2)
    stack = np.stack([image, image[::-1]])
    p8, m8 = minfer(variables, stack)
    assert p8.shape == (2, 96, 96) and p8.dtype == np.uint8
    # mask rule: p8 > floor(0.62*255) = 158
    np.testing.assert_array_equal(np.asarray(m8), np.asarray(p8) > 158)


def test_emit_validated():
    with pytest.raises(ValueError, match="emit"):
        make_sliding_infer(lambda *a, **k: None,
                           InferConfig(emit="fp16"), channels=2)
