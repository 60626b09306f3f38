"""Identification configs — every reference constant becomes a field.

Reference sources:
* basic:    ``plume_identifier_basic.py:32-37``
* rg:       ``plume_identifier_rg.py:35-44``
* gaussian: ``plume_identifier_gaussian_profile.py:34-44``
* blob:     ``plume_indetifier_blob.py`` (filename typo is the reference's)

Capacities (``max_fires``, threshold-set lengths) are *static* so the whole
pipeline jit-compiles once per scene shape; ragged fire/plume counts are
carried as validity masks (SURVEY.md §7 "hard parts" #4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class CompatFlags:
    """Opt-in reproduction of reference bugs (SURVEY.md §7 bug register).

    Each flag documents which side its default sits on — the defaults match
    what the parity oracles pin (``pick_larger_mask=True`` is the reference's
    COMMITTED behavior, ``reject_last_threshold=True`` is its INTENDED one);
    read the per-field notes before flipping anything.
    """

    #: Reference comment says "select the smaller plume mask" but the code
    #: keeps the larger one (``plume_identifier_rg.py:388-397``). The committed
    #: behavior (larger) is the default because it is what the pipeline
    #: actually shipped; set False to follow the comment.
    pick_larger_mask: bool = True

    #: ``plume_identifier_rg.py:228``/``..._gaussian_profile.py:234`` intend to
    #: reject fires whose ratio argmax is the *last* entry, but compare against
    #: ``extent_ratios.size`` (unreachable since argmax < size). True applies
    #: the intended ``size - 1`` rejection; False replicates the dead branch.
    reject_last_threshold: bool = True


def _descending_thresholds(step: float, maximum: float) -> Tuple[float, ...]:
    """``np.abs(np.arange(0, maximum, step) - maximum)`` — the reference's
    descending threshold sweep (``plume_identifier_rg.py:37``,
    ``plume_identifier_gaussian_profile.py:492``)."""
    return tuple(float(t) for t in np.abs(np.arange(0.0, maximum, step) - maximum))


@dataclass(frozen=True)
class BaseIdentifyConfig:
    #: half window (pixels) for fire→plume association
    #: (basic ``:34`` uses 10; rg ``:39`` and gaussian ``:36`` use 15)
    win_half: int = 15
    #: static per-scene fire-cluster capacity (padded with invalid entries)
    max_fires: int = 64
    #: static per-scene accepted-plume capacity
    max_plumes: int = 32
    compat: CompatFlags = field(default_factory=CompatFlags)


@dataclass(frozen=True)
class BasicIdentifyConfig(BaseIdentifyConfig):
    """Fixed-threshold detector (``plume_identifier_basic.py``)."""

    win_half: int = 10                 # P_ID_WIN_SIZE (:34)
    min_frp: float = 10.0              # MIN_FRP (:32)
    cluster_dist_km: float = 10.0      # CLUSTER_DIST (:33)
    aod_ratio_limit: float = 3.0       # AOD_RATIO_LIMIT (:35)
    aod_min_limit: float = 0.2         # AOD_MIN_LIMIT (:36)
    max_plume_pixels: int = 10000      # size gate (:255)
    min_plume_pixels: int = 100        # size gate (:257)


@dataclass(frozen=True)
class RGIdentifyConfig(BaseIdentifyConfig):
    """Threshold-sweep / region-growth detector (``plume_identifier_rg.py``)."""

    min_frp: float = 10.0              # MIN_FRP (:35)
    cluster_dist_km: float = 5.0       # CLUSTER_DIST (:36)
    thresholds: Tuple[float, ...] = _descending_thresholds(0.05, 1.0)  # (:37)
    min_plume_pixels: int = 100        # MIN_PLUME_PIXELS (:41)
    max_plume_pixels: int = 2000       # MAX_PLUME_PIXELS (:42)
    side_ratio: float = 5.0            # SIDE_RATIO (:43)
    max_lim: float = 0.1               # MAX_LIM (:44)
    #: savgol smoothing of the minor-axis transect (window, polyorder)
    #: (``plume_identifier_rg.py:345``)
    savgol_window: int = 17
    savgol_polyorder: int = 3
    max_peaks: int = 1                 # "<= 1 peak" (:349)
    n_transect: int = 1000             # linspace sample count (:334)


@dataclass(frozen=True)
class GaussianIdentifyConfig(BaseIdentifyConfig):
    """Multi-scale multi-orbit detector (``plume_identifier_gaussian_profile.py``)."""

    threshold_steps: Tuple[float, ...] = (0.02, 0.03, 0.04)   # (:34)
    threshold_maxes: Tuple[float, ...] = (0.5, 0.75, 1.0)     # (:35)
    min_plume_pixels: int = 100        # (:38)
    max_plume_pixels: int = 2000       # (:39)
    max_lim: float = 0.1               # (:40)
    null_value: float = -999.0         # NULL_VALUE (:41)
    max_invalid_frac: float = 0.2      # MAX_INVAL_PIX (:42)
    min_axis_ratio: float = 8.0        # MIN_AXIS_RATIO (:43)
    max_peaks: int = 3                 # N_PEAKS (:44)
    min_fire_cluster_px: int = 3       # remove_small_objects(min_size=3) (:132)
    min_fires_per_scene: int = 20      # (:598-600)
    dilate_plume_px: int = 5           # 5x5 buffer dilation (:278)
    n_transect: int = 1000             # (:415)

    def threshold_sets(self) -> Tuple[Tuple[float, ...], ...]:
        return tuple(
            _descending_thresholds(s, m)
            for s, m in zip(self.threshold_steps, self.threshold_maxes)
        )


@dataclass(frozen=True)
class BlobIdentifyConfig:
    """LoG/DoG/DoH blob baseline (``plume_indetifier_blob.py:40-48``)."""

    min_sigma: float = 1.0
    max_sigma: float = 30.0
    num_sigma: int = 10
    threshold_log: float = 0.1
    threshold_dog: float = 0.1
    threshold_doh: float = 0.01
    #: pairwise disc-overlap fraction above which the smaller-sigma blob
    #: is discarded (the published algorithm's default pruning)
    overlap: float = 0.5
