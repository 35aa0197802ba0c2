"""Learnable per-frame body-model parameters.

Re-design of /root/reference/models/body_model_params.py:5-68: instead of
nn.Embedding tables, a plain param pytree with per-leaf trainability masks
(consumed by optax.multi_transform in the training system).

Layout: {'betas': (1, 10), 'global_orient': (F, 3), 'body_pose': (F, P),
'transl': (F, 3), ...}. betas are shared across frames and initialised to
the mean of the per-frame values (reference :52-56, train.py:152-162).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PARAM_DIMS = {
    "smpl": {"betas": 10, "global_orient": 3, "transl": 3, "body_pose": 69},
    "smplh": {"betas": 10, "global_orient": 3, "transl": 3, "body_pose": 63,
              "left_hand_pose": 6, "right_hand_pose": 6},
    "smplx": {"betas": 10, "global_orient": 3, "transl": 3, "body_pose": 63,
              "left_hand_pose": 6, "right_hand_pose": 6, "jaw_pose": 3,
              "expression": 10},
    # hand-only rig (reference smplx/body_models.py MANO family)
    "mano": {"betas": 10, "global_orient": 3, "transl": 3, "hand_pose": 6},
    # head rig (reference smplx/body_models.py FLAME family)
    "flame": {"betas": 10, "global_orient": 3, "transl": 3, "neck_pose": 3,
              "jaw_pose": 3, "leye_pose": 3, "reye_pose": 3,
              "expression": 10},
}


def init_body_params(num_frames: int, model_type: str = "smpl",
                     pose_dim: Optional[int] = None) -> dict:
    """Zero-initialised store. pose_dim overrides body_pose width (e.g. for
    reduced-joint synthetic rigs; reference cfg.pose_dim, config.py:33)."""
    dims = dict(PARAM_DIMS[model_type])
    if pose_dim is not None:
        dims["body_pose"] = pose_dim
    return {
        name: jnp.zeros((1 if name == "betas" else num_frames, dim),
                        dtype=jnp.float32)
        for name, dim in dims.items()
    }


def load_body_params_from_dataset(frame_ids: list[int], root_dir: str,
                                  model_type: str = "smpl") -> dict:
    """Initialise from the per-frame pkls (reference train.py:152-162);
    betas = mean over frames."""
    import os

    from animnerf_tpu.smpl.loader import load_pickle

    dims = PARAM_DIMS[model_type]
    per_frame: dict[str, list[np.ndarray]] = {k: [] for k in dims}
    for fid in frame_ids:
        raw = load_pickle(os.path.join(root_dir, f"{model_type}s",
                                       f"{fid:06d}.pkl"))
        for k in dims:
            if k in raw:
                per_frame[k].append(np.asarray(raw[k], np.float32).reshape(-1))
            else:
                per_frame[k].append(np.zeros(dims[k], np.float32))
    out = {}
    for k, dim in dims.items():
        arr = np.stack(per_frame[k])[:, :dim]
        if k == "betas":
            arr = arr.mean(axis=0, keepdims=True)
        out[k] = jnp.asarray(arr)
    return out


def lookup_body_params(body_params: dict, frame_idx: jax.Array) -> dict:
    """Gather the per-frame params for a batch of frame indices.

    betas are frame-shared (index 0), like the reference's
    betas(zeros_like(frame_ids)) (body_model_params.py:61-68).
    """
    out = {}
    for k, v in body_params.items():
        if k == "betas":
            out[k] = jnp.broadcast_to(v[0], (frame_idx.shape[0], v.shape[-1]))
        else:
            out[k] = v[frame_idx]
    return out


def batch_params_from_data(batch: dict, model_type: str = "smpl",
                           template: bool = False) -> dict:
    """Extract (templated) body params carried in a data batch."""
    suffix = "_template" if template else ""
    return {k: batch[k + suffix] for k in PARAM_DIMS[model_type]
            if k + suffix in batch}


def trainable_labels(body_params: dict, optim: bool = True) -> dict:
    """Leaf labels for optax.multi_transform ('body' vs 'frozen')."""
    return {k: ("body" if optim else "frozen") for k in body_params}
