"""Visualization — the layer the reference promised at
``src/visualization/visualize.py`` (0 bytes on disk, ``README.md:47-49``)
plus the per-scene annotated plots its identify mains write inline
(``plume_identifier_rg.py:581-596``, ``..._basic.py:382-394``,
``..._gaussian_profile.py:625-636``)."""

from plumekit.viz.plots import (
    plot_identify_bboxes,
    plot_identify_hulls,
    plot_prediction,
    plot_training_history,
)

__all__ = ["plot_identify_bboxes", "plot_identify_hulls", "plot_prediction",
           "plot_training_history"]
