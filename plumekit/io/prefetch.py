"""Double-buffered host→device prefetch (BASELINE.json config 5).

The reference processes granules strictly serially — decode then compute in
one thread (``plume_identifier_rg.py:537-576``). Here a background thread
decodes/stages the next batch while the device computes on the current one,
so HBM transfer and host decode hide behind device time.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


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

    def producer():
        try:
            for item in iterable:
                q.put(put(item))
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
