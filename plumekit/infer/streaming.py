"""Streaming multi-granule inference (BASELINE.json config 5): host decode
pool → double-buffered HBM prefetch → batched device inference.

The reference processed granules strictly serially (decode, then compute,
one thread — ``plume_identifier_rg.py:537-576``). Here a background thread
decodes and stages granule ``i+1`` onto the device while granule ``i`` is
being inferred, so host IO hides behind device time
(:func:`plumekit.io.prefetch.device_prefetch`).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from plumekit.io.granule import Granule, load_granule
from plumekit.io.prefetch import decode_pool, device_prefetch
from plumekit.infer.sliding import pad_to_multiple
from plumekit.utils import get_logger

logger = get_logger(__name__)


def decode_granule_channels(
    path: str,
    depth: int,
    fire_locator: Optional[Callable[[Granule], Tuple[list, list]]] = None,
) -> Tuple[str, np.ndarray, Tuple[int, int]]:
    """Decode one granule to a model-ready (H', W', 2) channel stack (padded
    to the U-Net divisibility). Pure host work — safe to run on pool
    threads (npz inflate / h5 decode release the GIL)."""
    from plumekit.train.data import assemble_channels

    granule = load_granule(path)
    rows, cols = fire_locator(granule) if fire_locator else ([], [])
    channels = assemble_channels(granule.first_layer(), rows, cols)
    padded, hw = pad_to_multiple(channels, 2**depth)
    return granule.name, padded, hw


def granule_channel_stream(
    paths: Iterable[str],
    depth: int,
    fire_locator: Optional[Callable[[Granule], Tuple[list, list]]] = None,
    decode_workers: int = 1,
    predecoded: Optional[dict] = None,
) -> Iterator[Tuple[str, np.ndarray, Tuple[int, int]]]:
    """Stream of decoded granules; with ``decode_workers > 1`` decodes run
    on a thread pool with ordered delivery (config 5's host decode pool).

    ``predecoded`` maps a path to its already-decoded
    ``(name, channels, hw)`` tuple — a caller that had to decode a granule
    anyway (int8 calibration) hands it in instead of paying the decode
    twice. Entries are consumed (popped) on first use."""
    def decode(p):
        if predecoded and p in predecoded:
            return predecoded.pop(p)
        return decode_granule_channels(p, depth, fire_locator)

    if decode_workers > 1:
        yield from decode_pool(
            paths,
            decode,
            workers=decode_workers,
            depth=decode_workers + 1,
        )
        return
    for path in paths:
        yield decode(path)


# shared affine codecs (also used by the quantized training-transfer path)
from plumekit.ops.quant import dequantize as _dequantize  # noqa: F401
from plumekit.ops.quant import (  # noqa: F401
    dequantize_probs_uint8 as _dequantize_probs,
    quantize_probs_uint8 as _quantize_probs,
    quantize_uint16,
)

# wrapper-program cache: stream_inference builds jit wrappers around the
# caller's infer_fn (dequant / output-encode / vmap composition). A fresh
# jax.jit PER CALL would re-trace on every invocation — measured ~1 s of
# host time per stream on the 1152² program, which more than cancelled the
# uint8-readback saving when first benchmarked. Keyed on infer_fn (its
# own jit cache persists alongside) then by the flag tuple.

def _cached_program(infer_fn, key, build):
    """Per-``infer_fn`` program cache, stored ON the function object.

    The wrappers built here close over ``infer_fn``, so a global registry
    — even a WeakKeyDictionary — would keep every entry alive forever
    (the value strongly references its own key). Hanging the dict off
    ``infer_fn.__dict__`` ties the compiled programs' lifetime to the
    function itself: when the caller drops its infer program, the
    wrappers (a pure, gc-collectable cycle) go with it. Callables
    without a ``__dict__`` (rare: bound builtins) just skip caching."""
    try:
        per_fn = infer_fn.__dict__.setdefault("_plumekit_programs", {})
    except AttributeError:
        return build()
    if key not in per_fn:
        per_fn[key] = build()
    return per_fn[key]


def stream_inference(
    paths: Iterable[str],
    infer_fn: Callable,
    variables,
    depth: int,
    buffer_size: int = 2,
    fire_locator=None,
    decode_workers: Optional[int] = None,
    quantize: bool = False,
    batch_granules: int = 1,
    infer_is_batched: bool = False,
    predecoded: Optional[dict] = None,
    quantize_output: bool = False,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Run ``infer_fn(variables, image) -> (probs, mask)`` over a granule
    stream: a ``decode_workers``-thread pool decodes granules in parallel
    (ordered), a stager thread transfers them to HBM ``buffer_size`` ahead,
    and the device computes on the current one. Yields (granule_name, probs
    cropped to the original shape).

    ``decode_workers=None`` sizes the pool to the host: ``cpu_count - 1``
    capped at 4, minimum 1. Measured on the 1-core tunnel host: a 4-thread
    pool is pure contention (0.77× vs serial) while single-thread prefetch
    reaches 2.10×; the pool pays off only with real decode parallelism.

    ``quantize=True`` uploads uint16 payloads (half the bytes through the
    measured 16-20 MB/s relay ceiling) and dequantises on device inside
    the inference program (:func:`quantize_uint16`).

    ``batch_granules=G`` groups consecutive same-shape granules and runs
    each group through ONE dispatched program (``jax.vmap`` over the
    granule axis — the per-program dispatch tax amortises across G;
    see :func:`plumekit.infer.sliding.make_multi_granule_infer`). The
    tail group runs at its natural (smaller) size.

    ``infer_is_batched=True`` says ``infer_fn`` itself accepts the stacked
    ``(G, H, W, C)`` group (an AOT-exported multi-granule program,
    :mod:`plumekit.infer.export`, or :func:`make_multi_granule_infer`
    directly). Groups are then fed whole — no vmap wrapping, which a
    fixed-shape exported program could not accept — and a ragged tail is
    padded by repeating its last granule (the duplicate outputs are
    dropped), since the program's leading dim is baked in.

    ``predecoded`` (path → decoded tuple) lets a caller that already
    decoded some granules (int8 calibration) feed them in without a second
    decode — see :func:`granule_channel_stream`.

    ``quantize_output=True`` encodes the prob plane as uint8/255 INSIDE
    the inference program and decodes after readback — quartering the
    device→host bytes (the bigger half of the round-3 transfer budget:
    ~19 MB/s downlink ≈ 300 ms per 1152² fp32 plane vs 140 ms for the
    uint16 upload). Yielded probs differ from fp32 by ≤ 1/510; a
    0.5-threshold mask can flip only inside that hairline band. Implies a
    jitted program (composes with every other option)."""
    if infer_is_batched and batch_granules < 2:
        raise ValueError(
            "infer_is_batched requires batch_granules >= 2 (the program's "
            "leading granule dim); a single-granule program takes plain "
            "(H, W, C) images — pass infer_is_batched=False")
    if decode_workers is None:
        import os

        decode_workers = max(1, min(4, (os.cpu_count() or 1) - 1))

    def put(item):
        name, channels, hw = item
        if quantize:
            q, lo, scale = quantize_uint16(channels)
            payload = (jax.device_put(q), jnp.asarray(lo),
                       jnp.asarray(scale))
        else:
            payload = jax.device_put(jnp.asarray(channels))
        return name, payload, hw

    stream = device_prefetch(
        granule_channel_stream(paths, depth, fire_locator,
                               decode_workers=decode_workers,
                               predecoded=predecoded),
        buffer_size=buffer_size,
        device_put=put,
    )

    # dequant lives INSIDE the jitted program so the host→device transfer
    # stays uint16; jit caches by payload shape, so mixed-shape streams and
    # ragged tail groups each compile once
    if quantize:
        def run_one(variables, payload):
            q, lo, scale = payload
            return infer_fn(variables, _dequantize(q, lo, scale))
    else:
        def run_one(variables, payload):
            return infer_fn(variables, payload)

    if quantize_output:
        # encode INSIDE the program so the readback hop carries uint8;
        # the mask output is dropped here — the stream never yields it,
        # and with the probs encoded it would otherwise be the readback
        _fp_run_one = run_one

        def run_one(variables, payload):
            probs, _mask = _fp_run_one(variables, payload)
            return _quantize_probs(probs), ()

    def readback(probs_dev: np.ndarray) -> np.ndarray:
        # crop first (host slicing is free), decode only when encoded
        return (_dequantize_probs(probs_dev) if quantize_output
                else probs_dev)

    if batch_granules <= 1 and not infer_is_batched:
        if quantize or quantize_output:
            # jit only for the dequant/encode fusion (the payload must
            # stay quantized across each transfer); the plain path calls
            # infer_fn as-is — it is typically already jitted, and the
            # documented contract (any infer_fn(variables, image) ->
            # (probs, mask)) includes host-side implementations that a
            # trace would break
            run_one = _cached_program(
                infer_fn, ("one", quantize, quantize_output),
                lambda f=run_one: jax.jit(f))
        for name, payload, (h, w) in stream:
            probs, _mask = run_one(variables, payload)
            yield name, readback(np.asarray(probs)[:h, :w])
        return

    if infer_is_batched:
        # infer_fn consumes the whole (G, H, W, C) stack itself; dequant
        # params are stacked per granule, so broadcast over the spatial dims
        if quantize:
            def run_group_fn(variables, payload):
                q, lo, scale = payload
                return infer_fn(variables,
                                _dequantize(q, lo[:, None, None, :],
                                            scale[:, None, None, :]))
        else:
            def run_group_fn(variables, payload):
                return infer_fn(variables, payload)
        if quantize_output:
            _fp_run_group = run_group_fn

            def run_group_fn(variables, payload):
                probs, _masks = _fp_run_group(variables, payload)
                return _quantize_probs(probs), ()
        run_group = _cached_program(
            infer_fn, ("batched", quantize, quantize_output),
            lambda: jax.jit(run_group_fn))
    else:
        # run_one already carries the output encode when requested
        run_group = _cached_program(
            infer_fn, ("group", quantize, quantize_output),
            lambda: jax.jit(jax.vmap(run_one, in_axes=(None, 0))))

    def flush(group):
        n = len(group)
        if infer_is_batched and n < batch_granules:
            # fixed-leading-dim program (AOT export): pad the ragged tail
            # by repeating the last granule; its duplicate outputs are
            # dropped below
            group = group + [group[-1]] * (batch_granules - n)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[p for _, p, _ in group])
        probs, _masks = run_group(variables, stacked)
        probs = np.asarray(probs)
        for i, (name, _p, (h, w)) in enumerate(group[:n]):
            yield name, readback(probs[i, :h, :w])

    group = []
    for item in stream:
        if group and jax.tree.map(
                lambda x: x.shape,
                group[0][1]) != jax.tree.map(lambda x: x.shape, item[1]):
            yield from flush(group)
            group = []
        group.append(item)
        if len(group) == batch_granules:
            yield from flush(group)
            group = []
    if group:
        yield from flush(group)
