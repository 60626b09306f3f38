"""Device ops — the TPU-native equivalents of the scipy/skimage/sklearn calls
the reference leans on (SURVEY.md §2.1 table). All ops are jit/vmap-friendly
with static shapes; ragged results are carried as fixed-capacity arrays plus
validity masks.
"""

from plumekit.ops.morphology import (
    binary_erosion,
    binary_dilation,
    binary_dilation_square,
    binary_opening_cross,
)
from plumekit.ops.ccl import (
    connected_components,
    connected_components_host,
    component_sizes,
    remove_small_components,
    BACKGROUND,
)
from plumekit.ops.segment import (
    masked_bbox,
    masked_centroid,
    masked_moments_cov,
    label_window_nearest,
)
from plumekit.ops.transect import (
    savgol_coefficients,
    savgol_smooth,
    count_peaks_masked,
    line_transect,
)
from plumekit.ops.inpaint import nearest_fill
from plumekit.ops.geometry import eig2x2_sym, principal_axes, points_in_convex_hull
from plumekit.ops.cluster import dbscan_haversine, mean_cluster_positions

__all__ = [
    "binary_erosion",
    "binary_dilation",
    "binary_dilation_square",
    "binary_opening_cross",
    "connected_components",
    "connected_components_host",
    "component_sizes",
    "remove_small_components",
    "BACKGROUND",
    "masked_bbox",
    "masked_centroid",
    "masked_moments_cov",
    "label_window_nearest",
    "savgol_coefficients",
    "savgol_smooth",
    "count_peaks_masked",
    "line_transect",
    "nearest_fill",
    "eig2x2_sym",
    "principal_axes",
    "points_in_convex_hull",
    "dbscan_haversine",
    "mean_cluster_positions",
]
