"""360-degree turntable novel-view synthesis CLI.

Parity: reference novel_view.py:118-210 — per-view rotation of the
root-frame rays, optimized-vs-original pose selection, `--betas_2th` shape
editing, `--template` T-pose rendering, png + gif output.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--cfg_file", type=str, default=None)
    parser.add_argument("--frame_id", type=int, default=1)
    parser.add_argument("--cam_id", type=int, default=0)
    parser.add_argument("--template", action="store_true",
                        help="render the canonical template pose")
    parser.add_argument("--orig_pose", action="store_true",
                        help="use the pkl pose instead of the optimized one")
    parser.add_argument("--dis_threshold", type=float, default=0.2)
    parser.add_argument("--betas_2th", type=float, default=0,
                        help="offset added to the 2nd shape coefficient")
    parser.add_argument("--n_views", type=int, default=120)
    parser.add_argument("--angle", type=int, default=0)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import imageio
    import numpy as np

    from animnerf_tpu.cli.common import (
        load_cam_and_rays,
        load_frame_params,
        load_system_and_params,
        optimized_frame_params,
        resolve_cfg,
    )
    from animnerf_tpu.render.inference import Renderer, turntable_rotation
    from animnerf_tpu.utils.vis import colorize_depth, save_image, to_uint8

    cfg = resolve_cfg(args.ckpt_path, args.cfg_file, args.opts)
    cfg.dis_threshold = args.dis_threshold

    system, params = load_system_and_params(cfg, args.ckpt_path)

    tag = "T" if args.template else str(args.frame_id)
    pose_tag = "orig_pose" if args.orig_pose else "optim_pose"
    save_dir = os.path.join(cfg.outputs_dir, cfg.exp_name,
                            f"novel_view_{tag}_{pose_tag}_{args.angle}")
    os.makedirs(os.path.join(save_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(save_dir, "depths"), exist_ok=True)

    frame_idx, body_params, template = load_frame_params(cfg, args.frame_id)
    if not args.orig_pose:
        body_params = optimized_frame_params(cfg, params, frame_idx,
                                             body_params)
    if args.template:  # T-pose view (reference novel_view.py:186-187)
        body_params = dict(body_params, body_pose=template["body_pose"])
    if args.betas_2th:  # shape editing (reference :189)
        betas = np.array(body_params["betas"])
        betas[:, 1] += args.betas_2th
        import jax.numpy as jnp

        body_params = dict(body_params, betas=jnp.asarray(betas))

    cam, rays = load_cam_and_rays(cfg, args.cam_id)
    W, H = cfg.img_wh

    renderer = Renderer(system)
    frames = []
    # pipelined turntable: view i+1's programs are enqueued before view
    # i's outputs are fetched (render/inference.py::render_stream)
    stream = renderer.render_stream(params, [
        dict(body_params=body_params, body_tmpl=template, rays=rays,
             P=turntable_rotation(i, args.n_views, args.angle),
             img_wh=(W, H))
        for i in range(args.n_views)])
    for i, (img, mask, depth) in enumerate(stream):
        depth_vis = colorize_depth(depth)
        save_image(os.path.join(save_dir, "images", f"{i:06d}.png"), img)
        save_image(os.path.join(save_dir, "depths", f"{i:06d}.png"), depth_vis)
        frames.append(np.concatenate([to_uint8(img), depth_vis], axis=1))
        print(f"view {i + 1}/{args.n_views}", flush=True)

    gif = os.path.join(save_dir, "novel_view.gif")
    imageio.mimsave(gif, frames, fps=30)
    print(f"Saved to {gif}")


if __name__ == "__main__":
    main()
