"""Infra utilities (layer L1): io, visualization, video, rasterizer."""

from animnerf_tpu.utils.io import (
    load_json_file,
    load_obj,
    load_pickle_file,
    save_obj,
    write_json_file,
    write_pickle_file,
)
from animnerf_tpu.utils.vis import (
    colorize_alpha,
    colorize_depth,
    save_image,
    save_triptych,
    to_uint8,
    triptych,
)

__all__ = [
    "load_json_file", "load_obj", "load_pickle_file", "save_obj",
    "write_json_file", "write_pickle_file", "colorize_alpha",
    "colorize_depth", "save_image", "save_triptych", "to_uint8", "triptych",
]
