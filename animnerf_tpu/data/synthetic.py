"""Synthetic SMPL-like rigs and datasets for tests and benchmarks.

Real SMPL assets are license-gated downloads (reference README.md:45-56), so
the test-suite exercises the full pipeline on procedurally generated rigs
with the same tensor layout: a humanoid-ish kinematic chain, smooth LBS
weights, random but small blendshape bases, and valid on-disk pkl format.
"""

from __future__ import annotations

import numpy as np


def make_rig(num_verts: int = 256, num_joints: int = 24, num_betas: int = 10,
             seed: int = 0, surface: bool = False) -> dict:
    """Build a synthetic body-model dict (same keys as loader.load_model_data).

    Joints are placed along a chain in 3D; vertices are scattered around the
    bones; lbs weights fall off smoothly with distance to each joint so the
    rig deforms plausibly. All arrays float32.

    surface=True samples vertices ON capsule (tube) surfaces around the
    bones instead of as a volumetric cloud — a true 2-manifold with tight
    2-D neighbourhoods and bone-grid-coherent vertex ORDER, i.e. the
    regime real scans/SMPL bodies live in (VERDICT r2 ask 4: ~7% coarse
    survivors, tight clusters). The default cloud rig stays for
    continuity with earlier benchmarks.
    """
    rng = np.random.default_rng(seed)
    J, V = num_joints, num_verts

    # A branching kinematic tree: each joint's parent is a random earlier
    # joint biased toward the immediate predecessor (chain-like with limbs).
    parents = np.empty(J, dtype=np.int32)
    parents[0] = -1
    for j in range(1, J):
        parents[j] = j - 1 if rng.random() < 0.7 else rng.integers(0, j)

    # Rest-pose joint locations: walk the tree with random offsets.
    joints_rest = np.zeros((J, 3), dtype=np.float32)
    for j in range(1, J):
        offset = rng.normal(scale=0.12, size=3).astype(np.float32)
        offset[1] += 0.08  # grow upward
        joints_rest[j] = joints_rest[parents[j]] + offset

    if surface:
        # vertices on a (t, phi) grid over each bone's capsule surface;
        # per-bone grids laid out contiguously -> index-coherent order
        n_phi = 8
        per_bone = max(n_phi, V // (J - 1) // n_phi * n_phi)
        pts = []
        for j in range(1, J):
            a = joints_rest[j] - joints_rest[parents[j]]
            ln = np.linalg.norm(a) + 1e-8
            a_hat = a / ln
            ref = np.array([0.0, 0.0, 1.0], np.float32)
            if abs(a_hat @ ref) > 0.9:
                ref = np.array([1.0, 0.0, 0.0], np.float32)
            n1 = np.cross(a_hat, ref)
            n1 /= np.linalg.norm(n1) + 1e-8
            n2 = np.cross(a_hat, n1)
            r = 0.03 + 0.03 * rng.random()
            n_t = per_bone // n_phi
            t = np.linspace(0.0, 1.0, n_t, dtype=np.float32)[:, None, None]
            phi = (np.linspace(0.0, 2 * np.pi, n_phi, endpoint=False,
                               dtype=np.float32)[None, :, None]
                   + rng.random() * 2 * np.pi)
            ring = r * (np.cos(phi) * n1[None, None] +
                        np.sin(phi) * n2[None, None])
            pts.append((joints_rest[parents[j]][None, None]
                        + t * a[None, None] + ring).reshape(-1, 3))
        v_template = np.concatenate(pts, axis=0)
        if len(v_template) < V:  # fill the remainder on random bones
            extra = rng.integers(0, len(v_template), size=V - len(v_template))
            v_template = np.concatenate(
                [v_template, v_template[extra]
                 + rng.normal(scale=0.005, size=(len(extra), 3))], axis=0)
        v_template = v_template[:V].astype(np.float32)
    else:
        # Vertices: sample along bones with noise.
        bone_choice = rng.integers(1, J, size=V)
        t = rng.random(V).astype(np.float32)[:, None]
        v_template = (
            joints_rest[parents[bone_choice]] * (1 - t)
            + joints_rest[bone_choice] * t
            + rng.normal(scale=0.04, size=(V, 3)).astype(np.float32)
        )

    # LBS weights: inverse-square distance to joints, top-4 sparsified.
    d2 = ((v_template[:, None] - joints_rest[None]) ** 2).sum(-1) + 1e-4
    w = 1.0 / d2
    top4 = np.argsort(-w, axis=1)[:, :4]
    mask = np.zeros_like(w)
    np.put_along_axis(mask, top4, 1.0, axis=1)
    w = w * mask
    lbs_weights = (w / w.sum(1, keepdims=True)).astype(np.float32)

    # J_regressor: each joint regressed from its nearest vertices.
    jr = 1.0 / d2.T  # (J, V)
    topv = np.argsort(-jr, axis=1)[:, :8]
    m = np.zeros_like(jr)
    np.put_along_axis(m, topv, 1.0, axis=1)
    jr = jr * m
    J_regressor = (jr / jr.sum(1, keepdims=True)).astype(np.float32)

    shapedirs = rng.normal(scale=0.01, size=(V, 3, num_betas)).astype(np.float32)
    posedirs = rng.normal(scale=0.001, size=(9 * (J - 1), V * 3)).astype(np.float32)

    # Fake triangulation: connect consecutive vertex indices.
    idx = np.arange(V, dtype=np.int32)
    faces = np.stack([idx, (idx + 1) % V, (idx + 2) % V], axis=1)

    return {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "J_regressor": J_regressor,
        "parents": parents,
        "lbs_weights": lbs_weights,
        "faces": faces,
    }


def make_body_model(num_verts: int = 256, num_joints: int = 24,
                    num_betas: int = 10, seed: int = 0, model_type: str = "smpl",
                    num_pca: int = 6, surface: bool = False):
    """Synthetic BodyModel pytree ready for animnerf_tpu.smpl.forward.

    For model_type 'smplh'/'smplx' the rig gets the right joint counts
    (52/55 unless overridden) plus random hand-PCA bases and mean poses.
    """
    import jax.numpy as jnp

    from animnerf_tpu.smpl.body_model import BodyModel, NUM_JOINTS

    if model_type in ("smplh", "smplx", "mano", "flame") and num_joints == 24:
        num_joints = NUM_JOINTS[model_type]

    rig = make_rig(num_verts, num_joints, num_betas, seed, surface=surface)
    extra = np.arange(min(4, num_verts), dtype=np.int32)  # fake keypoints
    kwargs = {}
    if model_type == "mano":
        rng = np.random.default_rng(seed + 77)
        kwargs = dict(
            hand_components_l=jnp.asarray(
                rng.normal(scale=0.1, size=(num_pca, 45)).astype(np.float32)),
            hand_mean_l=jnp.asarray(
                rng.normal(scale=0.02, size=45).astype(np.float32)),
        )
    if model_type in ("smplh", "smplx"):
        rng = np.random.default_rng(seed + 77)
        kwargs = dict(
            hand_components_l=jnp.asarray(
                rng.normal(scale=0.1, size=(num_pca, 45)).astype(np.float32)),
            hand_components_r=jnp.asarray(
                rng.normal(scale=0.1, size=(num_pca, 45)).astype(np.float32)),
            hand_mean_l=jnp.asarray(
                rng.normal(scale=0.02, size=45).astype(np.float32)),
            hand_mean_r=jnp.asarray(
                rng.normal(scale=0.02, size=45).astype(np.float32)),
        )
    return BodyModel(
        v_template=jnp.asarray(rig["v_template"]),
        shapedirs=jnp.asarray(rig["shapedirs"]),
        posedirs=jnp.asarray(rig["posedirs"]),
        J_regressor=jnp.asarray(rig["J_regressor"]),
        lbs_weights=jnp.asarray(rig["lbs_weights"]),
        parents=rig["parents"],
        faces=rig["faces"],
        extra_joint_idxs=extra,
        model_type=model_type,
        gender="neutral",
        **kwargs,
    )


def write_synthetic_dataset(
    root_dir: str,
    num_frames: int = 4,
    img_wh: tuple[int, int] = (64, 64),
    num_verts: int = 512,
    num_joints: int = 24,
    seed: int = 0,
    model_type: str = "smpl",
    pose_scale: float = 0.15,
) -> str:
    """Write a complete synthetic dataset in the reference on-disk layout
    (SURVEY.md §2.7): cam000/camera.pkl, cam000/images/*.png RGBA,
    {model_type}s/*.pkl, {model_type}_template.pkl, plus the body-model pkl
    at models/SMPL_NEUTRAL.pkl.

    Images are crude splat renders of the posed body (enough to exercise the
    full data+training pipeline and drive PSNR upward in smoke training).

    Returns the path of the body-model pkl.
    """
    import os
    import pickle

    import cv2

    from animnerf_tpu.ops.ray_utils import camera_to_c2w  # noqa: F401
    from animnerf_tpu.smpl.loader import save_model_data

    rng = np.random.default_rng(seed)
    os.makedirs(root_dir, exist_ok=True)
    img_dir = os.path.join(root_dir, "cam000", "images")
    smpl_dir = os.path.join(root_dir, f"{model_type}s")
    model_dir = os.path.join(root_dir, "models")
    for d in (img_dir, smpl_dir, model_dir):
        os.makedirs(d, exist_ok=True)

    rig = make_rig(num_verts=num_verts, num_joints=num_joints, seed=seed)
    model_path = os.path.join(model_dir, "SMPL_NEUTRAL.pkl")
    save_model_data(model_path, rig)

    W, H = img_wh
    f = 1.2 * max(W, H)
    cam = {
        "R": np.eye(3),
        "t": np.array([0.0, -0.2, 2.5]),  # body ~2.5m in front
        "camera_f": np.array([f, f], np.float64),
        "camera_c": np.array([W / 2.0, H / 2.0], np.float64),
        "camera_k": np.zeros(5),
        "height": H,
        "width": W,
    }
    with open(os.path.join(root_dir, "cam000", "camera.pkl"), "wb") as fh:
        pickle.dump(cam, fh)

    # template: X-ish pose (identity here), zero transl
    betas = rng.normal(scale=0.3, size=(1, 10)).astype(np.float32)
    template = {
        "betas": betas,
        "global_orient": np.zeros((1, 3), np.float32),
        "body_pose": np.zeros((1, 3 * (num_joints - 1)), np.float32),
        "transl": np.zeros((1, 3), np.float32),
    }

    # fg/bg points + signed distances approximated via nearest-vertex
    # distance minus a shell radius (prepare_template analogue).
    from animnerf_tpu.smpl.lbs import lbs as lbs_fn
    import jax.numpy as jnp

    tmpl_out = lbs_fn(
        jnp.asarray(template["betas"]),
        jnp.concatenate([jnp.asarray(template["global_orient"]),
                         jnp.asarray(template["body_pose"])], axis=1),
        jnp.asarray(rig["v_template"]), jnp.asarray(rig["shapedirs"]),
        jnp.asarray(rig["posedirs"]), jnp.asarray(rig["J_regressor"]),
        rig["parents"], jnp.asarray(rig["lbs_weights"]))
    tmpl_verts = np.asarray(tmpl_out.vertices[0])

    pts = rng.uniform(-1.2, 1.2, size=(8192, 3)).astype(np.float32)
    center = tmpl_verts.mean(0)
    pts = pts + center
    d2 = ((pts[:, None] - tmpl_verts[None]) ** 2).sum(-1)
    nearest = np.sqrt(d2.min(1))
    distances = (nearest - 0.06).astype(np.float32)  # inside shell < 0
    template_pkl = dict(template, points=pts, distances=distances)
    with open(os.path.join(root_dir, f"{model_type}_template.pkl"), "wb") as fh:
        pickle.dump(template_pkl, fh)

    # per-frame params + splat images
    K = np.array([[cam["camera_f"][0], 0, cam["camera_c"][0]],
                  [0, cam["camera_f"][1], cam["camera_c"][1]],
                  [0, 0, 1.0]])
    for i in range(num_frames):
        frame_id = i + 1
        params = {
            "betas": betas,
            "global_orient": rng.normal(scale=0.1, size=(1, 3)).astype(np.float32),
            "body_pose": rng.normal(
                scale=pose_scale, size=(1, 3 * (num_joints - 1))).astype(np.float32),
            "transl": np.array([[0.0, 0.0, 0.0]], np.float32)
            + rng.normal(scale=0.02, size=(1, 3)).astype(np.float32),
        }
        with open(os.path.join(smpl_dir, f"{frame_id:06d}.pkl"), "wb") as fh:
            pickle.dump(params, fh)

        out = lbs_fn(
            jnp.asarray(params["betas"]),
            jnp.concatenate([jnp.asarray(params["global_orient"]),
                             jnp.asarray(params["body_pose"])], axis=1),
            jnp.asarray(rig["v_template"]), jnp.asarray(rig["shapedirs"]),
            jnp.asarray(rig["posedirs"]), jnp.asarray(rig["J_regressor"]),
            rig["parents"], jnp.asarray(rig["lbs_weights"]))
        verts = np.asarray(out.vertices[0]) + params["transl"][0]

        # project with the reference camera convention: x_cam = R @ x + t,
        # image y flipped (see ops/ray_utils.py docstring)
        xc = verts @ np.asarray(cam["R"]).T + np.asarray(cam["t"])
        uv = (xc / xc[:, 2:3]) @ K.T
        img = np.zeros((H, W, 4), np.uint8)
        order = np.argsort(-xc[:, 2])  # far first
        for j in order:
            u, v = int(round(uv[j, 0])), int(round(uv[j, 1]))
            if 0 <= u < W and 0 <= v < H:
                # colour encodes canonical position -> learnable signal
                cpos = tmpl_verts[j]
                col = (np.clip((cpos - center) * 2 + 0.5, 0, 1) * 255).astype(int)
                cv2.circle(img, (u, v), 2,
                           (int(col[0]), int(col[1]), int(col[2]), 255), -1)
        # BGRA on disk (cv2 convention, matching the loader's BGRA2RGBA)
        bgra = img[..., [2, 1, 0, 3]]
        cv2.imwrite(os.path.join(img_dir, f"{frame_id:06d}.png"), bgra)

    return model_path


def random_pose_params(num_joints: int = 24, num_betas: int = 10,
                       batch: int = 1, seed: int = 0, scale: float = 0.3) -> dict:
    rng = np.random.default_rng(seed)
    return {
        "betas": rng.normal(scale=0.5, size=(batch, num_betas)).astype(np.float32),
        "global_orient": rng.normal(scale=scale, size=(batch, 3)).astype(np.float32),
        "body_pose": rng.normal(
            scale=scale, size=(batch, 3 * (num_joints - 1))
        ).astype(np.float32),
        "transl": rng.normal(scale=0.5, size=(batch, 3)).astype(np.float32),
    }
