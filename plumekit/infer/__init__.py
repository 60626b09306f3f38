"""Inference: sliding-window stitching and spatially-sharded whole-granule."""

from plumekit.infer.sliding import make_sliding_infer, pad_to_multiple, tile_grid
from plumekit.infer.sharded import make_sharded_infer, choose_halo

__all__ = ["make_sliding_infer", "pad_to_multiple", "tile_grid",
           "make_sharded_infer", "choose_halo"]
