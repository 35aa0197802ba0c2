"""Unit and parity tests for the SMPL core (animnerf_tpu.smpl)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animnerf_tpu.data.synthetic import make_rig, random_pose_params
import animnerf_tpu.smpl.lbs as L


def test_rodrigues_identity():
    R = L.rodrigues(jnp.zeros((5, 3)))
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (5, 3, 3)),
                               atol=1e-5)


def test_rodrigues_quarter_turn_z():
    R = L.rodrigues(jnp.array([[0.0, 0.0, np.pi / 2]]))[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(R), expected, atol=1e-5)


def test_rodrigues_orthonormal():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    R = np.asarray(L.rodrigues(v))  # verify in numpy (f64) — the session's
    # default matmul precision is bf16, which would pollute the check itself
    RtR = np.einsum("bij,bik->bjk", R.astype(np.float64), R.astype(np.float64))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R.astype(np.float64)), 1.0,
                               atol=1e-5)


def _naive_chain(rot_mats, joints, parents):
    """Sequential-loop forward kinematics in numpy (the reference algorithm,
    smplx/lbs.py:348-404) as an independent oracle for pointer doubling."""
    B, J = joints.shape[:2]
    rel = joints.copy()
    rel[:, 1:] -= joints[:, parents[1:]]
    local = np.zeros((B, J, 4, 4), dtype=joints.dtype)
    local[..., :3, :3] = rot_mats
    local[..., :3, 3] = rel
    local[..., 3, 3] = 1.0
    world = np.zeros_like(local)
    world[:, 0] = local[:, 0]
    for j in range(1, J):
        world[:, j] = world[:, parents[j]] @ local[:, j]
    posed = world[..., :3, 3].copy()
    A = world.copy()
    A[..., :3, 3] -= np.einsum("bjmn,bjn->bjm", world[..., :3, :3], joints)
    return posed, A


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("num_joints", [2, 24, 52])
def test_chain_matches_sequential_oracle(seed, num_joints):
    rng = np.random.default_rng(seed)
    rig = make_rig(num_verts=32, num_joints=num_joints, seed=seed)
    B = 3
    rot = np.asarray(
        L.rodrigues(jnp.asarray(rng.normal(scale=0.5, size=(B, num_joints, 3))
                                .astype(np.float32)))
    )
    joints = rng.normal(size=(B, num_joints, 3)).astype(np.float32)
    posed_ref, A_ref = _naive_chain(rot, joints, rig["parents"])
    posed, A = L.rigid_transform_chain(jnp.asarray(rot), jnp.asarray(joints),
                                       rig["parents"])
    np.testing.assert_allclose(np.asarray(posed), posed_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(A), A_ref, atol=2e-5)


def test_lbs_identity_pose_is_shaped_template():
    rig = make_rig(num_verts=64, num_joints=8, seed=3)
    B = 2
    betas = jnp.asarray(np.random.default_rng(0).normal(size=(B, 10)).astype(np.float32))
    pose = jnp.zeros((B, 8 * 3))
    out = L.lbs(betas, pose, jnp.asarray(rig["v_template"]),
                jnp.asarray(rig["shapedirs"]), jnp.asarray(rig["posedirs"]),
                jnp.asarray(rig["J_regressor"]), rig["parents"],
                jnp.asarray(rig["lbs_weights"]))
    expected = rig["v_template"][None] + np.asarray(out.shape_offsets)
    # identity pose -> pose_offsets == 0, A == I, verts == v_shaped
    np.testing.assert_allclose(np.asarray(out.pose_offsets), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vertices), expected, atol=1e-5)
    eye = np.broadcast_to(np.eye(4), out.joints_transform.shape)
    np.testing.assert_allclose(np.asarray(out.joints_transform), eye, atol=1e-5)


def test_lbs_transform_consistency():
    """vertices == T @ (v_template + offsets): T must reproduce the verts."""
    rig = make_rig(num_verts=128, num_joints=24, seed=7)
    params = random_pose_params(24, batch=2, seed=11)
    out = L.lbs(jnp.asarray(params["betas"]),
                jnp.concatenate([jnp.asarray(params["global_orient"]),
                                 jnp.asarray(params["body_pose"])], axis=1),
                jnp.asarray(rig["v_template"]), jnp.asarray(rig["shapedirs"]),
                jnp.asarray(rig["posedirs"]), jnp.asarray(rig["J_regressor"]),
                rig["parents"], jnp.asarray(rig["lbs_weights"]))
    v_rest = (rig["v_template"][None] + np.asarray(out.shape_offsets)
              + np.asarray(out.pose_offsets))
    T = np.asarray(out.vertices_transform)
    recon = np.einsum("bvmn,bvn->bvm", T[..., :3, :3], v_rest) + T[..., :3, 3]
    np.testing.assert_allclose(recon, np.asarray(out.vertices), atol=1e-5)


def _reference_lbs_available():
    import importlib.util
    import os
    return (os.path.exists("/root/reference/smplx/lbs.py")
            and importlib.util.find_spec("torch") is not None)


@pytest.mark.skipif(not _reference_lbs_available(),
                    reason="reference repo / torch not available")
@pytest.mark.parametrize("seed", [0, 5])
def test_lbs_parity_vs_reference_torch(seed):
    """Cross-check the full six-tuple against the reference implementation."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from smplx.lbs import lbs as torch_lbs
    finally:
        sys.path.pop(0)

    rig = make_rig(num_verts=200, num_joints=24, seed=seed)
    params = random_pose_params(24, batch=2, seed=seed)
    full_pose = np.concatenate([params["global_orient"], params["body_pose"]], 1)

    tt = lambda x: torch.from_numpy(np.asarray(x))
    ref = torch_lbs(tt(params["betas"]), tt(full_pose), tt(rig["v_template"]),
                    tt(rig["shapedirs"]), tt(rig["posedirs"]),
                    tt(rig["J_regressor"]), torch.from_numpy(rig["parents"]).long(),
                    tt(rig["lbs_weights"]))
    ref_verts, ref_joints, ref_A, ref_T, ref_so, ref_po = [x.numpy() for x in ref]

    out = L.lbs(jnp.asarray(params["betas"]), jnp.asarray(full_pose),
                jnp.asarray(rig["v_template"]), jnp.asarray(rig["shapedirs"]),
                jnp.asarray(rig["posedirs"]), jnp.asarray(rig["J_regressor"]),
                rig["parents"], jnp.asarray(rig["lbs_weights"]))

    np.testing.assert_allclose(np.asarray(out.shape_offsets), ref_so, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pose_offsets), ref_po, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.joints), ref_joints, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.joints_transform), ref_A, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vertices_transform), ref_T, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vertices), ref_verts, atol=1e-5)


def test_lbs_jit_and_grad():
    rig = make_rig(num_verts=64, num_joints=12, seed=1)
    params = random_pose_params(12, batch=1, seed=1)

    def loss_fn(pose):
        out = L.lbs(jnp.asarray(params["betas"]), pose,
                    jnp.asarray(rig["v_template"]), jnp.asarray(rig["shapedirs"]),
                    jnp.asarray(rig["posedirs"]), jnp.asarray(rig["J_regressor"]),
                    rig["parents"], jnp.asarray(rig["lbs_weights"]))
        return jnp.sum(out.vertices ** 2)

    full_pose = jnp.asarray(
        np.concatenate([params["global_orient"], params["body_pose"]], 1))
    g = jax.jit(jax.grad(loss_fn))(full_pose)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
