"""Synthetic SMPL-like rigs and datasets for tests and benchmarks.

Real SMPL assets are license-gated downloads (reference README.md:45-56), so
the test-suite exercises the full pipeline on procedurally generated rigs
with the same tensor layout: a humanoid-ish kinematic chain, smooth LBS
weights, random but small blendshape bases, and valid on-disk pkl format.
"""

from __future__ import annotations

import numpy as np


def make_rig(num_verts: int = 256, num_joints: int = 24, num_betas: int = 10,
             seed: int = 0) -> dict:
    """Build a synthetic body-model dict (same keys as loader.load_model_data).

    Joints are placed along a chain in 3D; vertices are scattered around the
    bones; lbs weights fall off smoothly with distance to each joint so the
    rig deforms plausibly. All arrays float32.
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
                    num_betas: int = 10, seed: int = 0, model_type: str = "smpl"):
    """Synthetic BodyModel pytree ready for animnerf_tpu.smpl.forward."""
    import jax.numpy as jnp

    from animnerf_tpu.smpl.body_model import BodyModel

    rig = make_rig(num_verts, num_joints, num_betas, seed)
    extra = np.arange(min(4, num_verts), dtype=np.int32)  # fake keypoints
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
    )


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
