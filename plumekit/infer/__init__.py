"""Inference: sliding-window stitching and spatially-sharded whole-granule."""

from plumekit.infer.sliding import (make_batch_infer_sharded,
                                    make_multi_granule_infer,
                                    make_sliding_infer, pad_to_multiple,
                                    tile_grid)
from plumekit.infer.sharded import make_sharded_infer, choose_halo
from plumekit.infer.streaming import stream_inference, granule_channel_stream
from plumekit.infer.export import (export_sliding_infer, save_exported,
                                   load_exported)
from plumekit.infer.serve import serve_loop, scan_pending, ServeStats

__all__ = ["make_sliding_infer", "make_multi_granule_infer",
           "make_batch_infer_sharded", "pad_to_multiple", "tile_grid",
           "make_sharded_infer", "choose_halo", "stream_inference",
           "granule_channel_stream", "export_sliding_infer",
           "save_exported", "load_exported", "serve_loop", "scan_pending",
           "ServeStats"]
