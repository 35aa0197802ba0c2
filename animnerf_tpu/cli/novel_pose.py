"""Novel-pose animation CLI driven by Mixamo mocap.

Parity: reference novel_pose.py:26-177 — loads `result.pkl` mocap
(anim_len/smpl_array/cam_array), drives the trained subject with each mocap
pose using the optimized betas and mean optimized transl plus the mocap's
in-plane offset; renders image/mask/depth pngs, an SMPL raster overlay, and
a gif.
"""

from __future__ import annotations

import argparse
import os


def load_mixamo_smpl(actions_dir: str, action_type: str = "0007",
                     skip: int = 1) -> list[dict]:
    """Mocap pkl -> list of per-frame smpl dicts (reference :26-41)."""
    import numpy as np

    from animnerf_tpu.smpl.loader import load_pickle

    result = load_pickle(os.path.join(actions_dir, action_type, "result.pkl"))
    anim_len = int(result["anim_len"])
    pose_array = np.asarray(result["smpl_array"], np.float32).reshape(anim_len, -1)
    cam_array = np.asarray(result["cam_array"], np.float32)
    mocap = []
    for i in range(0, anim_len, skip):
        mocap.append({
            "cam": cam_array[i],
            "global_orient": pose_array[i, :3],
            "body_pose": pose_array[i, 3:72],
            "transl": np.array([cam_array[i, 1], cam_array[i, 2], 0.0],
                               np.float32),
        })
    return mocap


def main(argv=None) -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--cfg_file", type=str, default=None)
    parser.add_argument("--actions_dir", type=str, default="mocap/mixamo/")
    parser.add_argument("--action_type", type=str, default="0007")
    parser.add_argument("--frame_id", type=int, default=1)
    parser.add_argument("--cam_id", type=int, default=0)
    parser.add_argument("--frame_skip", type=int, default=2)
    parser.add_argument("--dis_threshold", type=float, default=0.2)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import imageio
    import jax.numpy as jnp
    import numpy as np

    from animnerf_tpu.cli.common import (
        load_cam_and_rays,
        load_frame_params,
        load_system_and_params,
        resolve_cfg,
    )
    from animnerf_tpu.render.inference import Renderer
    from animnerf_tpu.utils.renderer import SoftwareRenderer
    from animnerf_tpu.utils.vis import colorize_depth, save_image, to_uint8
    import animnerf_tpu.smpl.body_model as bm

    cfg = resolve_cfg(args.ckpt_path, args.cfg_file, args.opts)
    cfg.dis_threshold = args.dis_threshold

    system, params = load_system_and_params(cfg, args.ckpt_path)

    save_dir = os.path.join(cfg.outputs_dir, cfg.exp_name,
                            f"novel_pose_{args.action_type}")
    for sub in ("images", "masks", "depths", "smpls_vis"):
        os.makedirs(os.path.join(save_dir, sub), exist_ok=True)

    _, src_params, template = load_frame_params(cfg, args.frame_id)
    # betas/transl come from the *trained* store (reference :130-131)
    betas = params["body_params"]["betas"][:1]
    transl_mean = params["body_params"]["transl"].mean(axis=0, keepdims=True)

    cam, rays = load_cam_and_rays(cfg, args.cam_id)
    W, H = cfg.img_wh
    raster = SoftwareRenderer((H, W))
    raster.set_camera(cam["camera_f"][0], cam["camera_f"][1],
                      cam["camera_c"][0], cam["camera_c"][1],
                      np.asarray(cam["R"], np.float64),
                      np.asarray(cam["t"], np.float64).reshape(3))

    mocap = load_mixamo_smpl(args.actions_dir, args.action_type,
                             args.frame_skip)
    renderer = Renderer(system)
    pose_dim = cfg.get("pose_dim") or (69 if cfg.model_type == "smpl" else 63)

    frames = []
    all_body_params = [{
        "betas": betas,
        "global_orient": jnp.asarray(mc["global_orient"])[None],
        "body_pose": jnp.asarray(mc["body_pose"][:pose_dim])[None],
        "transl": transl_mean + jnp.asarray(mc["transl"])[None],
    } for mc in mocap]
    # pipelined mocap stream (render/inference.py::render_stream)
    stream = renderer.render_stream(params, [
        dict(body_params=bp, body_tmpl=template, rays=rays, img_wh=(W, H))
        for bp in all_body_params])
    for i, (img, mask, depth) in enumerate(stream):
        body_params = all_body_params[i]
        depth_vis = colorize_depth(depth)
        save_image(os.path.join(save_dir, "images", f"{i:06d}.png"), img)
        save_image(os.path.join(save_dir, "masks", f"{i:06d}.png"),
                   np.repeat(mask[..., None], 3, axis=-1))
        save_image(os.path.join(save_dir, "depths", f"{i:06d}.png"), depth_vis)

        out = bm.forward(system.body_model, **body_params)
        verts = np.asarray(out.vertices[0])
        overlay = raster.render(verts, system.body_model.faces)
        save_image(os.path.join(save_dir, "smpls_vis", f"{i:06d}.png"), overlay)

        frames.append(np.concatenate([to_uint8(img), depth_vis], axis=1))
        print(f"mocap frame {i + 1}/{len(mocap)}", flush=True)

    gif = os.path.join(save_dir, "novel_pose.gif")
    imageio.mimsave(gif, frames, fps=30)
    print(f"Saved to {gif}")


if __name__ == "__main__":
    main()
