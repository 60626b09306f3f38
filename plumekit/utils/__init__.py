"""Shared utilities: structured logging and stage timers.

The reference used per-module ``logging`` breadcrumbs only
(``plume_identifier_rg.py:23-25``, SURVEY.md §5 metrics row); plumekit adds
stage timers with ``block_until_ready`` boundaries for honest device timing.
"""

from plumekit.utils.logging import get_logger
from plumekit.utils.timers import Timer, StageTimes, profile_trace
from plumekit.utils.metrics import MetricsWriter

__all__ = ["get_logger", "Timer", "StageTimes", "profile_trace",
           "MetricsWriter"]
