"""Mesh extraction CLI.

Parity: reference extract_mesh.py:27-202 — dense N^3 sigma grid centered on
the (root-frame) body, relu(sigma) - threshold, smoothing, isosurface
extraction (native marching tetrahedra instead of PyMCubes), grid->world
remap (the reference's axis-swapped mcubes_to_world), OBJ export of both the
SMPL body and the extracted mesh, optional software-raster turntable gif.
Queries go through the full unpose path, i.e. the mesh is in OBSERVED pose
space.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def create_grid(N: int, x_range, y_range, z_range) -> np.ndarray:
    x = np.linspace(x_range[0], x_range[1], N)
    y = np.linspace(y_range[0], y_range[1], N)
    z = np.linspace(z_range[0], z_range[1], N)
    return np.stack(np.meshgrid(x, y, z), -1)  # (N, N, N, 3), xy swapped


def grid_to_world(vertices: np.ndarray, N: int, x_range, y_range,
                  z_range) -> np.ndarray:
    """Grid-index -> world coords incl. the meshgrid x/y swap
    (reference extract_mesh.py:37-47)."""
    v = vertices / N
    out = np.empty_like(v)
    out[:, 0] = (y_range[1] - y_range[0]) * v[:, 1] + y_range[0]
    out[:, 1] = (x_range[1] - x_range[0]) * v[:, 0] + x_range[0]
    out[:, 2] = (z_range[1] - z_range[0]) * v[:, 2] + z_range[0]
    return out


def main(argv=None) -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--cfg_file", type=str, default=None)
    parser.add_argument("--frame_id", type=int, default=1)
    parser.add_argument("--cam_id", type=int, default=0)
    parser.add_argument("--template", action="store_true")
    parser.add_argument("--orig_pose", action="store_true")
    parser.add_argument("--N_grid", type=int, default=256)
    parser.add_argument("--x_range", nargs="+", type=float, default=[-1.2, 1.2])
    parser.add_argument("--y_range", nargs="+", type=float, default=[-1.2, 1.2])
    parser.add_argument("--z_range", nargs="+", type=float, default=[-1.2, 1.2])
    parser.add_argument("--sigma_threshold", type=float, default=20.0)
    parser.add_argument("--dis_threshold", type=float, default=0.2)
    parser.add_argument("--no_smooth", action="store_true")
    parser.add_argument("--vis", action="store_true")
    parser.add_argument("--n_views", type=int, default=120)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from animnerf_tpu.cli.common import (
        load_cam_and_rays,
        load_frame_params,
        load_system_and_params,
        optimized_frame_params,
        resolve_cfg,
    )
    from animnerf_tpu.models.warp import affine_inverse, prepare_frame
    from animnerf_tpu.ops.marching import marching_cubes, smooth
    from animnerf_tpu.render.inference import Renderer
    from animnerf_tpu.utils.io import save_obj
    import animnerf_tpu.smpl.body_model as bm

    cfg = resolve_cfg(args.ckpt_path, args.cfg_file, args.opts)
    cfg.dis_threshold = args.dis_threshold

    system, params = load_system_and_params(cfg, args.ckpt_path)

    tag = "T" if args.template else str(args.frame_id)
    pose_tag = ("optim_pose" if not args.orig_pose and cfg.optim_body_params
                else "orig_pose")
    save_dir = os.path.join(cfg.outputs_dir, cfg.exp_name,
                            f"mesh_{tag}_{pose_tag}")
    os.makedirs(save_dir, exist_ok=True)

    frame_idx, body_params, template = load_frame_params(cfg, args.frame_id)
    if not args.orig_pose:
        body_params = optimized_frame_params(cfg, params, frame_idx,
                                             body_params)
    if args.template:  # full template body (reference extract_mesh.py:136-141)
        body_params = dict(template)

    ctx = prepare_frame(system.body_model, body_params, template)
    verts_rf = np.asarray(ctx.verts[0])
    save_obj(os.path.join(save_dir, "smpl.obj"), verts_rf,
             system.body_model.faces)

    N = args.N_grid
    grid = create_grid(N, args.x_range, args.y_range, args.z_range)
    center = (verts_rf.max(0) + verts_rf.min(0)) / 2.0
    points = grid.reshape(1, -1, 3).astype(np.float32) + center

    renderer = Renderer(system)
    sigmas = renderer.query_sigma_observed(
        params, body_params, template, points,
        use_fine=system.scene_cfg.use_fine)
    sigmas = np.maximum(np.asarray(sigmas).reshape(N, N, N), 0)
    field = sigmas - args.sigma_threshold
    if not args.no_smooth:
        field = smooth(field)

    # inside = field > 0; our kernel treats below-iso as inside, so negate
    # (the reference calls marching_cubes(-smoothed, 0), :164-166)
    vertices, faces = marching_cubes(-field, 0.0)
    vertices = grid_to_world(vertices, N, args.x_range, args.y_range,
                             args.z_range) + center

    mesh_path = os.path.join(save_dir, "mesh.obj")
    save_obj(mesh_path, vertices, faces)
    print(f"Saved to {mesh_path} ({len(vertices)} verts, {len(faces)} tris)")

    if args.vis:
        import imageio

        from animnerf_tpu.utils.renderer import SoftwareRenderer

        os.makedirs(os.path.join(save_dir, "images"), exist_ok=True)
        cam, _ = load_cam_and_rays(cfg, args.cam_id)
        H, W = cam["height"], cam["width"]
        raster = SoftwareRenderer((H, W))
        R = np.asarray(cam["R"], np.float64)
        t = np.asarray(cam["t"], np.float64).reshape(3)
        # camera rebased into the root frame (reference :183-190)
        g_inv = np.asarray(affine_inverse(
            jnp.asarray(bm.forward(system.body_model, **body_params)
                        .joints_transform[:, 0]))[0])
        R = g_inv[:3, :3] @ R
        t = g_inv[:3, 3] + t
        raster.set_camera(cam["camera_f"][0], cam["camera_f"][1],
                          cam["camera_c"][0], cam["camera_c"][1], R, t)
        frames = []
        for i in range(args.n_views):
            img = raster.render(vertices, faces,
                                angle=-i / args.n_views * 360, axis=[0, 1, 0])
            imageio.imwrite(os.path.join(save_dir, "images",
                                         f"{i:06d}.png"), img)
            frames.append(img)
        imageio.mimsave(os.path.join(save_dir, "3d_rec.gif"), frames, fps=30)
        print(f"Saved to {os.path.join(save_dir, '3d_rec.gif')}")


if __name__ == "__main__":
    main()
