"""SMPL-family body models, pure JAX (layer L3 of the framework)."""

from animnerf_tpu.smpl.body_model import (
    BodyModel,
    BodyModelOutput,
    NUM_BODY_JOINTS,
    NUM_JOINTS,
    create,
    forward,
)
from animnerf_tpu.smpl import lbs  # submodule; call smpl.lbs.lbs(...)
from animnerf_tpu.smpl.lbs import (
    LBSOutput,
    blend_shapes,
    rigid_transform_chain,
    rodrigues,
    transform_mat,
    vertices2joints,
)
from animnerf_tpu.smpl.loader import load_model_data, load_pickle, save_model_data

__all__ = [
    "BodyModel",
    "BodyModelOutput",
    "NUM_BODY_JOINTS",
    "NUM_JOINTS",
    "create",
    "forward",
    "LBSOutput",
    "blend_shapes",
    "lbs",
    "rigid_transform_chain",
    "rodrigues",
    "transform_mat",
    "vertices2joints",
    "load_model_data",
    "load_pickle",
    "save_model_data",
]
