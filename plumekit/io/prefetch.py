"""Double-buffered host→device prefetch (BASELINE.json config 5).

The reference processes granules strictly serially — decode then compute in
one thread (``plume_identifier_rg.py:537-576``). Here a background thread
decodes/stages the next batch while the device computes on the current one,
so HBM transfer and host decode hide behind device time.
"""

from __future__ import annotations

import itertools
import queue
import threading
from collections import deque
from typing import Callable, Iterable, Iterator, Optional, TypeVar

import jax

T = TypeVar("T")
U = TypeVar("U")


def decode_pool(
    items: Iterable[T],
    decode_fn: Callable[[T], U],
    workers: int = 4,
    depth: int = 4,
) -> Iterator[U]:
    """Multi-threaded decode with *ordered* delivery: up to ``depth`` items
    are in flight across ``workers`` threads, results yield in submission
    order. This is the "host decode pool" half of config 5 — npz inflate,
    HDF decode and channel assembly run in parallel under released GILs
    while the consumer (device staging / inference) drains in order.
    A worker exception propagates to the consumer at that item's turn.
    """
    from concurrent.futures import ThreadPoolExecutor

    it = iter(items)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        pending: deque = deque(
            ex.submit(decode_fn, x) for x in itertools.islice(it, depth)
        )
        while pending:
            nxt = pending.popleft()
            for x in itertools.islice(it, 1):
                pending.append(ex.submit(decode_fn, x))
            yield nxt.result()


def device_prefetch(
    iterable: Iterable,
    buffer_size: int = 2,
    device_put: Optional[Callable] = None,
) -> Iterator:
    """Iterate ``iterable``, staging items onto device ``buffer_size`` ahead.

    ``device_put`` defaults to :func:`jax.device_put` (applied to pytrees);
    pass a custom callable to stage with explicit shardings.
    """
    put = device_put or jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    _END = object()
    err: list = []
    stop = threading.Event()

    def blocking_put(item) -> bool:
        # bounded put that gives up when the consumer abandoned the
        # stream — otherwise a dropped generator would park this thread
        # on a full queue forever, pinning buffer_size device arrays
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not blocking_put(put(item)):
                    return
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            blocking_put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer done or abandoned: release the producer and drop any
        # staged items so their device buffers free promptly
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
