"""plumekit — a TPU-native geospatial smoke-plume segmentation framework.

Clean-room rebuild of ``gridl/kcl-ltss-bioatm`` (a U-Net based classifier for
extracting biomass-burning smoke plumes from EO imagery; reference
``README.md:1-4``) re-designed for TPU hardware:

* the classical plume-identification pipeline (reference
  ``src/features/plume_identifier_{basic,rg,gaussian_profile}.py``) is
  re-expressed as batched XLA device ops (``plumekit.ops``) driven by a single
  ``identify()`` API (``plumekit.identify``);
* the promised-but-absent model layer (reference ``README.md:41-45``,
  ``src/models/`` is empty) is supplied as a Flax U-Net with a jit/pjit train
  step, dice+BCE loss, bf16 mixed precision and data-parallel sharding
  (``plumekit.models``, ``plumekit.train``);
* full-granule inference runs as vmapped sliding windows with on-device
  overlap-blend stitching, or spatially sharded across a device mesh with halo
  exchange (``plumekit.infer``, ``plumekit.parallel``);
* geodesy (MODIS sinusoidal grid, UTM resampling; reference
  ``src/features/tools.py``) is implemented natively in ``plumekit.geo`` —
  no pyproj/pyresample dependency.

Layout mirrors SURVEY.md §7.
"""

__version__ = "0.1.0"

from plumekit import config, geo, io, ops, utils  # noqa: F401

__all__ = ["config", "geo", "io", "ops", "utils", "__version__"]
