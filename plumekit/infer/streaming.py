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
) -> Iterator[Tuple[str, np.ndarray, Tuple[int, int]]]:
    """Stream of decoded granules; with ``decode_workers > 1`` decodes run
    on a thread pool with ordered delivery (config 5's host decode pool)."""
    if decode_workers > 1:
        yield from decode_pool(
            paths,
            lambda p: decode_granule_channels(p, depth, fire_locator),
            workers=decode_workers,
            depth=decode_workers + 1,
        )
        return
    for path in paths:
        yield decode_granule_channels(path, depth, fire_locator)


def stream_inference(
    paths: Iterable[str],
    infer_fn: Callable,
    variables,
    depth: int,
    buffer_size: int = 2,
    fire_locator=None,
    decode_workers: Optional[int] = None,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Run ``infer_fn(variables, image) -> (probs, mask)`` over a granule
    stream: a ``decode_workers``-thread pool decodes granules in parallel
    (ordered), a stager thread transfers them to HBM ``buffer_size`` ahead,
    and the device computes on the current one. Yields (granule_name, probs
    cropped to the original shape).

    ``decode_workers=None`` sizes the pool to the host: ``cpu_count - 1``
    capped at 4, minimum 1. Measured on the 1-core tunnel host: a 4-thread
    pool is pure contention (0.77× vs serial) while single-thread prefetch
    reaches 2.10×; the pool pays off only with real decode parallelism."""
    if decode_workers is None:
        import os

        decode_workers = max(1, min(4, (os.cpu_count() or 1) - 1))

    def put(item):
        name, channels, hw = item
        return name, jax.device_put(jnp.asarray(channels)), hw

    stream = device_prefetch(
        granule_channel_stream(paths, depth, fire_locator,
                               decode_workers=decode_workers),
        buffer_size=buffer_size,
        device_put=put,
    )
    for name, image, (h, w) in stream:
        probs, _mask = infer_fn(variables, image)
        yield name, np.asarray(probs)[:h, :w]
