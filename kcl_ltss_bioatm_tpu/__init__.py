"""Compatibility alias: ``kcl_ltss_bioatm_tpu`` re-exports :mod:`plumekit`.

The framework's importable name is ``plumekit``; this alias keeps the
reference-derived name usable (``gridl/kcl-ltss-bioatm`` → TPU rebuild).
"""

from plumekit import *  # noqa: F401,F403
from plumekit import __version__  # noqa: F401
import plumekit as _pk
import sys as _sys

# Make `kcl_ltss_bioatm_tpu.<sub>` resolve to `plumekit.<sub>`.
for _sub in ("config", "geo", "io", "ops", "identify", "models", "train",
             "infer", "parallel", "label", "utils", "viz", "data", "native"):
    try:
        _mod = __import__(f"plumekit.{_sub}", fromlist=[_sub])
        _sys.modules[f"{__name__}.{_sub}"] = _mod
        globals()[_sub] = _mod
    except ImportError:
        pass
