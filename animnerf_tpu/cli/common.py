"""Shared CLI plumbing: config resolution from checkpoints, body-param and
camera loading (the reference's get_smpl_params / get_cam_and_rays,
novel_view.py:21-76)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from animnerf_tpu.config import CfgNode, finalize, get_default_config
from animnerf_tpu.smpl.loader import load_pickle
from animnerf_tpu.training.checkpoints import load_metadata


def resolve_cfg(ckpt_path: Optional[str], cfg_file: Optional[str],
                opts: Optional[list[str]] = None) -> CfgNode:
    """Config priority: checkpoint-stored cfg -> YAML file -> CLI opts
    (the reference restores hparams from the PL checkpoint)."""
    cfg = get_default_config()
    if ckpt_path:
        if not os.path.exists(ckpt_path):
            raise FileNotFoundError(f"checkpoint not found: {ckpt_path!r}")
        try:
            meta = load_metadata(ckpt_path)
            if "cfg" in meta:
                cfg.merge_from_dict(meta["cfg"])
        except FileNotFoundError:
            pass  # bare param dir without meta.json: rely on --cfg_file
    if cfg_file:
        cfg.merge_from_file(cfg_file)
    if opts:
        cfg.merge_from_list(opts)
    return finalize(cfg)


def load_frame_params(cfg: CfgNode, frame_id: int):
    """(frame_idx, body_model_params, body_model_params_template) with a
    leading batch dim of 1 (reference get_smpl_params)."""
    import jax.numpy as jnp

    from animnerf_tpu.data.dataset import PARAM_KEYS

    pose_dim = cfg.get("pose_dim") or (69 if cfg.model_type == "smpl" else 63)
    path = os.path.join(cfg.root_dir, f"{cfg.model_type}s",
                        f"{frame_id:06d}.pkl")
    raw = load_pickle(path)
    params = {}
    for k in PARAM_KEYS[cfg.model_type]:
        if k in raw:
            v = np.asarray(raw[k], np.float32).reshape(-1)
            if k == "body_pose":
                v = v[:pose_dim]
            params[k] = jnp.asarray(v)[None]

    tmpl_raw = load_pickle(os.path.join(
        cfg.root_dir, f"{cfg.model_type}_template.pkl"))
    template = {}
    for k in PARAM_KEYS[cfg.model_type]:
        if k in tmpl_raw:
            v = np.asarray(tmpl_raw[k], np.float32).reshape(-1)
            if k == "body_pose":
                v = v[:pose_dim]
            template[k] = jnp.asarray(v)[None]

    frame_ids_index = {fid: i for i, fid in enumerate(cfg.frame_IDs)}
    frame_idx = frame_ids_index.get(frame_id, -1)
    return frame_idx, params, template


def load_cam_and_rays(cfg: CfgNode, cam_id: int, near: float = 0.1,
                      far: float = 10.0):
    """(cam dict scaled to img_wh, dense (H*W, 8) rays)."""
    from animnerf_tpu.ops.ray_utils import camera_to_c2w, gen_rays

    cam = load_pickle(os.path.join(cfg.root_dir, f"cam{cam_id:03d}",
                                   "camera.pkl"))
    W, H = cfg.img_wh
    cam = dict(cam)
    sx, sy = W / cam["width"], H / cam["height"]
    cam["camera_f"] = np.asarray(cam["camera_f"], np.float64) * [sx, sy]
    cam["camera_c"] = np.asarray(cam["camera_c"], np.float64) * [sx, sy]
    cam["height"], cam["width"] = H, W
    c2w = camera_to_c2w(np.asarray(cam["R"], np.float64),
                        np.asarray(cam["t"], np.float64))
    rays = gen_rays(c2w.astype(np.float32), H, W, cam["camera_f"],
                    near, far, cam["camera_c"]).reshape(-1, 8)
    return cam, rays


def load_system_and_params(cfg: CfgNode, ckpt_path: str):
    """Build the system and load checkpoint params."""
    import jax

    from animnerf_tpu.models.body_params import init_body_params
    from animnerf_tpu.training.checkpoints import load_params
    from animnerf_tpu.training.loop import build_system

    system = build_system(cfg)
    body_params = init_body_params(cfg.num_frames, cfg.model_type,
                                   pose_dim=cfg.pose_dim)
    params = system.init_params(jax.random.PRNGKey(0), body_params)
    params = load_params(ckpt_path, params)
    return system, params


def optimized_frame_params(cfg: CfgNode, params: dict, frame_idx: int,
                           fallback: dict) -> dict:
    """The trained per-frame params for frame_idx, or the given pkl params
    when the frame wasn't trained (frame_idx == -1)."""
    import jax.numpy as jnp

    from animnerf_tpu.models.body_params import lookup_body_params

    if frame_idx < 0 or not cfg.optim_body_params:
        return fallback
    return lookup_body_params(params["body_params"],
                              jnp.asarray([frame_idx], dtype=jnp.int32))
