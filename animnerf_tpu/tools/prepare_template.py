"""Template preparation: mean shape + X-pose + signed-distance point cloud.

Parity: reference tools/prepare_template.py:14-117 — mean betas over the
per-frame pkls, the X-pose from assets/X_pose.pkl (betas/global_orient/
body_pose/transl), template mesh via the body model, 64^3 random points in
a (2, 2, 5)-scaled bbox, signed distances (inside negative — the reference
flips trimesh's convention at :89), all written to
{model_type}_template.pkl.

trimesh+rtree replaced by ops/mesh_distance.py (exact point-to-triangle +
pseudo-normal sign).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def prepare_template(data_root: str, people_ID: str, gender: str = "male",
                     model_path: str = "smplx/models",
                     model_type: str = "smpl",
                     template_path: str = "assets/X_pose.pkl",
                     num_points: int = 64 ** 3, chunk: int = 512,
                     seed: int = 0) -> str:
    import jax.numpy as jnp

    from animnerf_tpu.ops.mesh_distance import signed_distance
    from animnerf_tpu.smpl.loader import load_pickle
    from animnerf_tpu.utils.io import write_pickle_file
    import animnerf_tpu.smpl.body_model as bm

    model = bm.create(model_path, model_type, gender)

    params_dir = os.path.join(data_root, people_ID, f"{model_type}s")
    frame_files = sorted(os.listdir(params_dir))
    betas = np.stack([
        np.asarray(load_pickle(os.path.join(params_dir, f))["betas"],
                   np.float32).reshape(-1)[:10]
        for f in frame_files
    ]).mean(0)

    tmpl = load_pickle(template_path)
    pose_dim = 69 if model_type == "smpl" else 63
    body_params = {
        "betas": jnp.asarray(betas)[None],
        "global_orient": jnp.asarray(
            np.asarray(tmpl["global_orient"], np.float32).reshape(-1))[None],
        "body_pose": jnp.asarray(
            np.asarray(tmpl["body_pose"], np.float32).reshape(-1)[:pose_dim])[None],
        "transl": jnp.asarray(
            np.asarray(tmpl["transl"], np.float32).reshape(-1))[None],
    }
    verts = np.asarray(bm.forward(model, **body_params).vertices[0])

    orig_bbox = np.stack([verts.min(0), verts.max(0)])
    center = orig_bbox.mean(0)
    scale = np.array([2.0, 2.0, 5.0])
    dxyz = orig_bbox[1] - orig_bbox[0]
    bbox = np.stack([center - dxyz * scale / 2, center + dxyz * scale / 2])

    rng = np.random.default_rng(seed)
    points = rng.random((num_points, 3))
    points = points * (bbox[1] - bbox[0]) + bbox[0]

    distances = signed_distance(points, verts, model.faces, chunk=chunk)

    out = {
        "betas": betas,
        "body_pose": np.asarray(tmpl["body_pose"], np.float32).reshape(-1)[:pose_dim],
        "global_orient": np.asarray(tmpl["global_orient"], np.float32).reshape(-1),
        "transl": np.asarray(tmpl["transl"], np.float32).reshape(-1),
        "model_type": model_type,
        "gender": gender,
        "verts": verts,
        "faces": model.faces,
        "center": center,
        "bbox": bbox,
        "points": points.astype(np.float32),
        "distances": distances.astype(np.float32),
    }
    path = os.path.join(data_root, people_ID, f"{model_type}_template.pkl")
    write_pickle_file(path, out)
    print(f"wrote {path} ({(distances < 0).sum()} inside / "
          f"{(distances > 0).sum()} outside points)")
    return path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="data/people_snapshot")
    parser.add_argument("--people_ID", type=str, default="male-3-casual")
    parser.add_argument("--gender", type=str, default="male")
    parser.add_argument("--model_path", type=str, default="smplx/models")
    parser.add_argument("--model_type", type=str, default="smpl")
    parser.add_argument("--template_path", type=str, default="assets/X_pose.pkl")
    parser.add_argument("--num_points", type=int, default=64 ** 3)
    parser.add_argument("--chunk", type=int, default=512)
    args = parser.parse_args(argv)
    prepare_template(args.data_root, args.people_ID, args.gender,
                     args.model_path, args.model_type, args.template_path,
                     args.num_points, args.chunk)


if __name__ == "__main__":
    main()
