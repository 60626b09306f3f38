"""Plume identification — one API over the reference's four detectors."""

from plumekit.identify.api import identify, PlumeSet, IdentifyConfig
from plumekit.identify import basic, rg, gaussian, blob  # noqa: F401

__all__ = ["identify", "PlumeSet", "IdentifyConfig", "basic", "rg",
           "gaussian", "blob"]
