"""Bounded TPU-backend probing (the round-3 tunnel-outage lesson).

When the tunneled TPU backend is down, *in-process* backend init blocks
~25 minutes before raising UNAVAILABLE — and the failure is then cached
for the process, so the command that paid the wait can't even fall back.
A cheap SUBPROCESS probe with retries rides out a transient outage in
minutes and fails fast (with a clear message) on a real one. Callers
that are about to commit their process to a long TPU run (bench, the
geometry tuner, training studies) should probe first; bench.py did this
first and the pattern is shared here.

No analogue in the reference (single-process CPU NumPy).
"""

from __future__ import annotations

import subprocess
import sys
import time

from plumekit.utils.logging import get_logger

logger = get_logger(__name__)


def probe_backend(attempts: int = 4, probe_timeout: int = 180,
                  backoff: int = 120) -> None:
    """Probe device availability in a bounded subprocess, retrying through
    transient outages. Raises RuntimeError when every attempt fails.

    The subprocess inherits the environment, NOT in-process jax config:
    a caller that already forced ``jax_platforms=cpu`` in-process must
    skip the probe (see :func:`should_probe`)."""
    last = ""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True, text=True)
            if r.returncode == 0:
                return
            tail = (r.stderr or "").strip().splitlines()[-1:] or [""]
            last = tail[0]
        except subprocess.TimeoutExpired:
            last = f"backend init exceeded {probe_timeout}s"
        logger.warning("backend probe %d/%d failed: %s", i + 1, attempts,
                       last)
        if i + 1 < attempts:
            time.sleep(backoff)
    raise RuntimeError(
        f"TPU backend unreachable after {attempts} probes: {last}")


def should_probe() -> bool:
    """True when this process will init a (possibly tunneled) accelerator
    backend — i.e. jax_platforms has NOT been forced to cpu in-process
    (the only override that wins against the force-registered plugin)."""
    import jax

    return (getattr(jax.config, "jax_platforms", None) or "") != "cpu"
