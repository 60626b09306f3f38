"""Granule acquisition dates.

The reference derives the scene date from the MAIAC filename —
``datetime.strptime(maiac_fname.split('.')[1][1:], '%Y%j')``
(``plume_identifier_rg.py:574``): the ``A2017255`` field is year + day-of-
year. plumekit parses the same convention when present and otherwise falls
back to a caller-supplied default (synthetic granules carry their date in
the fire table instead).
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Optional

import pandas as pd

_ACQ_RE = re.compile(r"\.A(\d{7})\.")


def granule_date(name: str, default=None) -> Optional[pd.Timestamp]:
    """Acquisition date from a MAIAC-style granule name
    (``MCD19A2.A2017255.h12v09...`` → 2017-09-12), else ``default``."""
    m = _ACQ_RE.search(name)
    if m:
        return pd.Timestamp(datetime.strptime(m.group(1), "%Y%j"))
    return default
