"""Continuous serving: watch a granule directory, predict new arrivals.

The reference's batch drivers already contain a primitive serving loop —
rerunning ``main()`` skips granules recorded in the processed-file log and
handles whatever appeared since (``plume_identifier_rg.py:537-576``,
``:557-568``), so operators "served" new data by re-invoking the script.
``plumekit serve`` generalises that into a long-running service with the
same semantics, minus the reference's log bugs (SURVEY.md bug #5):

* a :class:`plumekit.train.checkpoint.WorkLog` records served granules —
  restart-idempotent, exact-line membership;
* outputs are written atomically (tmp + ``os.replace``) and a granule is
  marked done only AFTER its output is durably on disk, so a crash between
  the two re-serves the granule instead of losing its prediction;
* files still being uploaded are skipped until their mtime is ``settle_s``
  old (the reference would decode a half-written HDF and swallow the error
  in its bare ``except``);
* the model program is built ONCE and reused across cycles (the reference
  re-imported and re-ran everything per invocation).

The loop core is model-agnostic: it scans, batches, and delegates to a
``process_batch(paths) -> int`` callback (the CLI wires the config-5
streaming pipeline — or an AOT artifact, or the int8 forward — into it).
Termination: ``once=True`` serves one scan's backlog and exits; ``idle_exit=N``
exits after N consecutive empty scans; ``max_cycles`` bounds total scans;
``stop_event`` (a ``threading.Event``) requests a graceful stop between
cycles — SIGINT/SIGTERM handlers set it.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

from plumekit.train.checkpoint import WorkLog
from plumekit.utils import get_logger

logger = get_logger(__name__)


@dataclass
class ServeStats:
    """Outcome of a :func:`serve_loop` run (returned, and mutated live so a
    supervising thread can watch progress)."""

    cycles: int = 0            # scans performed
    served: int = 0            # granules processed and marked done
    #: granules seen but deferred (unsettled file, or a processor that
    #: could not run yet — e.g. int8 awaiting a calibratable granule)
    deferred_last_cycle: int = 0
    errors: int = 0            # cycles whose process_batch raised
    stopped_by: str = ""       # "once" | "idle" | "max_cycles" | "stop_event"
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False, compare=False)


class UnionLog:
    """Read-only union view over several :class:`WorkLog`-shaped objects —
    serve scans against served ∪ failed without merging the files."""

    def __init__(self, *logs):
        self.logs = logs

    def done(self, item: str) -> bool:
        return any(log.done(item) for log in self.logs)

    def items(self) -> set:
        out: set = set()
        for log in self.logs:
            out |= log.items()
        return out


def scan_pending(
    scan_dir: str,
    worklog: WorkLog,
    extensions: Tuple[str, ...],
    settle_s: float = 2.0,
    now: Optional[float] = None,
) -> List[str]:
    """Sorted paths of granules in ``scan_dir`` that are (a) not yet in the
    worklog and (b) stable on disk — mtime at least ``settle_s`` old, so a
    file mid-upload is picked up on a later cycle instead of half-read.

    The worklog is snapshot once per scan (``worklog.items()``) — per-entry
    ``done()`` calls would re-read the whole log file for every directory
    entry, O(N²) lines per poll on a long-lived deployment."""
    if now is None:
        now = time.time()
    done = worklog.items()
    pending = []
    try:
        names = sorted(os.listdir(scan_dir))
    except FileNotFoundError:
        return []
    for name in names:
        if not name.endswith(extensions) or name in done:
            continue
        path = os.path.join(scan_dir, name)
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue  # vanished between listdir and stat
        if age < settle_s:
            logger.debug("serve: %s settled %.1fs < %.1fs — deferring",
                         name, age, settle_s)
            continue
        pending.append(path)
    return pending


def serve_loop(
    scan_dir: str,
    worklog: WorkLog,
    process_batch: Callable[[Sequence[str]], int],
    extensions: Tuple[str, ...],
    poll_s: float = 10.0,
    once: bool = False,
    idle_exit: int = 0,
    max_cycles: int = 0,
    settle_s: float = 2.0,
    stop_event: Optional[threading.Event] = None,
) -> ServeStats:
    """Run the watch loop. ``process_batch(paths)`` must serve each granule
    it can, mark the worklog itself (AFTER the output is durable), and
    return how many it served; paths it leaves unmarked are retried on the
    next cycle (the int8 no-calibratable-granule-yet case).

    Exits when: ``once`` (after the first scan's servable granules are
    done); ``idle_exit`` consecutive empty scans; ``max_cycles`` scans
    total; or
    ``stop_event`` is set (checked between cycles; processors may also
    watch it to stop between granules)."""
    stats = ServeStats()
    idle = 0
    while True:
        if stop_event is not None and stop_event.is_set():
            stats.stopped_by = "stop_event"
            return stats
        pending = scan_pending(scan_dir, worklog, extensions,
                               settle_s=settle_s)
        stats.cycles += 1
        if pending:
            idle = 0
            try:
                served = process_batch(pending)
            except Exception:
                # a daemon must outlive a bad cycle (the reference's loop
                # swallowed errors silently, SURVEY.md bug #7 — we log the
                # traceback and keep serving). Whatever was not marked done
                # is retried next cycle; processors quarantine granules
                # that fail deterministically so this cannot spin on one.
                logger.exception("serve: cycle %d failed — retrying "
                                 "unserved granules next cycle",
                                 stats.cycles)
                served = 0
                with stats._lock:
                    stats.errors += 1
            with stats._lock:
                stats.served += served
                stats.deferred_last_cycle = len(pending) - served
            if served:
                logger.info("serve: cycle %d served %d granule(s), %d "
                            "deferred", stats.cycles, served,
                            stats.deferred_last_cycle)
        else:
            idle += 1
            with stats._lock:
                stats.deferred_last_cycle = 0
        if once:
            # one scan, serve what's servable, exit. Deferred granules
            # (unsettled files, int8 awaiting a calibratable granule) stay
            # unmarked for the next invocation — retrying here could spin
            # forever on a backlog that can never become servable
            stats.stopped_by = "once"
            return stats
        if idle_exit and idle >= idle_exit:
            stats.stopped_by = "idle"
            return stats
        if max_cycles and stats.cycles >= max_cycles:
            stats.stopped_by = "max_cycles"
            return stats
        # interruptible sleep: a stop request mid-poll exits promptly
        if stop_event is not None:
            stop_event.wait(poll_s)
        else:
            time.sleep(poll_s)
