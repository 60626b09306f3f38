"""Structured per-step metrics (SURVEY.md §5: the reference logs breadcrumb
strings only; plumekit writes machine-readable step metrics)."""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional


class MetricsWriter:
    """Append-only CSV metrics: one row per step, columns discovered from the
    first write. Safe to re-open for resume (appends)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fields: Optional[list] = None
        if os.path.exists(path) and os.path.getsize(path):
            with open(path) as f:
                self._fields = next(csv.reader(f))

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        new = self._fields is None
        if new:
            self._fields = list(row)
        elif any(k not in self._fields for k in row):
            # a later run (e.g. a resume with eval enabled) logs new keys:
            # extend the header by rewriting the file — silently dropping
            # the new columns would record nothing for them forever
            import os as _os

            extended = self._fields + [k for k in row
                                       if k not in self._fields]
            if _os.path.exists(self.path):
                with open(self.path, newline="") as f:
                    old_rows = list(csv.DictReader(f))
            else:
                old_rows = []
            # rewrite via a temp file + atomic replace so a crash mid-rewrite
            # can't lose the run's whole metrics history
            tmp = self.path + ".tmp"
            with open(tmp, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=extended, restval="")
                w.writeheader()
                for r in old_rows:
                    w.writerow(r)
            _os.replace(tmp, self.path)
            self._fields = extended
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields, restval="",
                               extrasaction="ignore")
            if new:
                w.writeheader()
            w.writerow(row)
