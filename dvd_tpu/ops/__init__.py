from dvd_tpu.ops.grid_sample import grid_sample, warp
from dvd_tpu.ops.resize import resize_area, resize_bilinear

__all__ = ["grid_sample", "warp", "resize_bilinear", "resize_area"]
