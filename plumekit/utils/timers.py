"""Wall-clock stage timers with JAX-aware synchronisation."""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


def _sync(x):
    """Block until device work feeding ``x`` is done (no-op for host values)."""
    try:
        import jax

        jax.block_until_ready(x)
    except Exception:
        pass
    return x


@contextmanager
def profile_trace(log_dir: str):
    """``jax.profiler`` trace scope (SURVEY.md §5 tracing row: the reference
    has none; view with TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Context manager measuring wall seconds; ``timer.elapsed`` afterwards."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


class _StageHandle:
    """Mutable carrier so a stage block can register its device result
    for synchronisation: ``with st.stage('fwd') as h: h.sync(f(x))``."""

    def __init__(self):
        self.value = None

    def sync(self, value):
        self.value = value
        return value


class StageTimes:
    """Accumulates named stage durations; ``sync=`` forces device completion."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, name: str, sync=None):
        """``sync=`` accepts a value that exists BEFORE the block; to time
        work produced inside it, call ``handle.sync(result)`` on the
        yielded handle (under async dispatch, timing without a sync on the
        block's own output excludes nearly all device compute)."""
        handle = _StageHandle()
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            if sync is not None:
                _sync(sync)
            if handle.value is not None:
                _sync(handle.value)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)
