"""Linear blend skinning kernels, pure JAX.

TPU-native re-design of the reference LBS math (see
/root/reference/smplx/lbs.py:152-404 for behavioural parity targets):

  * ``rodrigues``            — axis-angle -> rotation matrices, batched
  * ``blend_shapes``         — beta-weighted shape displacements (einsum/MXU)
  * ``rigid_transform_chain``— forward kinematics over the joint tree using
                               *pointer doubling* (log-depth batched 4x4
                               matmuls) instead of the reference's
                               24-iteration python loop
  * ``lbs``                  — full skinning; returns the same six-tuple the
                               (modified) reference returns: vertices, posed
                               joints, per-joint transforms A, per-vertex
                               transforms T, shape offsets, pose offsets

Everything is shape-static and jit/vmap/grad friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def rodrigues(rot_vecs: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """Axis-angle vectors -> rotation matrices.

    Args:
      rot_vecs: (..., 3) axis-angle vectors.
    Returns:
      (..., 3, 3) rotation matrices.

    Matches the reference numerically (incl. the +1e-8 inside the norm that
    keeps the gradient finite at zero; reference smplx/lbs.py:298-332).
    """
    shifted = rot_vecs + epsilon
    angle = jnp.linalg.norm(shifted, axis=-1, keepdims=True)  # (..., 1)
    axis = rot_vecs / angle

    cos = jnp.cos(angle)[..., None]  # (..., 1, 1)
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    # Cross-product (hat) matrix K.
    K = jnp.stack(
        [
            jnp.stack([zeros, -rz, ry], axis=-1),
            jnp.stack([rz, zeros, -rx], axis=-1),
            jnp.stack([-ry, rx, zeros], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3)
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    return eye + sin * K + (1.0 - cos) * KK


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """Per-vertex displacement from blend-shape coefficients.

    Args:
      betas: (B, num_betas)
      shape_disps: (V, 3, num_betas)
    Returns:
      (B, V, 3)
    """
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps,
                      precision=jax.lax.Precision.HIGHEST)


def vertices2joints(J_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """Regress joint locations from vertices.

    Args:
      J_regressor: (J, V)
      vertices: (B, V, 3)
    Returns:
      (B, J, 3)
    """
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor,
                      precision=jax.lax.Precision.HIGHEST)


def transform_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """Build 4x4 homogeneous transforms from (..., 3, 3) R and (..., 3) t."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def _doubling_steps(parents) -> int:
    """Number of pointer-doubling iterations needed to resolve the tree."""
    import numpy as np

    parents = np.asarray(parents)
    depth = 0
    for j in range(len(parents)):
        d, p = 0, j
        while p > 0:
            p = int(parents[p])
            d += 1
        depth = max(depth, d)
    steps = 0
    while (1 << steps) < max(depth, 1):
        steps += 1
    return steps + 1


def rigid_transform_chain(
    rot_mats: jax.Array, joints: jax.Array, parents: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics over the joint tree.

    Instead of a sequential python loop over joints (reference
    smplx/lbs.py:386-392), composes world transforms by pointer doubling:
    after k iterations every joint has absorbed its 2^k nearest ancestors,
    so ceil(log2(depth)) batched (B*J,4,4) matmul rounds resolve any rig.

    Args:
      rot_mats: (B, J, 3, 3) local joint rotations.
      joints:   (B, J, 3) rest-pose joint locations.
      parents:  (J,) int parent indices; parents[0] == -1 (or 0, ignored).
    Returns:
      posed_joints: (B, J, 3) world joint locations.
      rel_transforms: (B, J, 4, 4) world transforms with the rest-pose joint
        location subtracted (the "A" matrices that act on rest-pose points).
    """
    B, J = joints.shape[:2]
    dtype = joints.dtype

    parents_np = jax.device_get(parents) if isinstance(parents, jax.Array) else parents
    rel_joints = joints.at[:, 1:].add(-joints[:, parents_np[1:]])

    local = transform_mat(rot_mats, rel_joints)  # (B, J, 4, 4)

    # Append an identity "virtual root parent" at index J so that -1/root
    # parents resolve to identity during doubling.
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (B, 1, 4, 4))
    G = jnp.concatenate([local, eye], axis=1)  # (B, J+1, 4, 4)

    import numpy as np

    p = np.asarray(parents_np).copy()
    p[0] = J  # root's parent -> identity slot
    p = np.concatenate([p, np.array([J])])  # identity's parent -> itself

    for _ in range(_doubling_steps(parents_np)):
        G = jnp.matmul(G[:, p], G, precision=jax.lax.Precision.HIGHEST)
        p = p[p]

    world = G[:, :J]  # (B, J, 4, 4)
    posed_joints = world[..., :3, 3]

    # A = world with translation re-based so it maps *rest-pose* points:
    # A[..., :3, 3] -= R_world @ j_rest  (equivalent to the reference's
    # transforms - pad(transforms @ joints_homo)).
    correction = jnp.einsum("bjmn,bjn->bjm", world[..., :3, :3], joints,
                            precision=jax.lax.Precision.HIGHEST)
    A = world.at[..., :3, 3].add(-correction)
    return posed_joints, A


class LBSOutput(NamedTuple):
    vertices: jax.Array        # (B, V, 3)
    joints: jax.Array          # (B, J, 3) posed joints
    joints_transform: jax.Array    # (B, J, 4, 4)  "A"
    vertices_transform: jax.Array  # (B, V, 4, 4)  "T"
    shape_offsets: jax.Array   # (B, V, 3)
    pose_offsets: jax.Array    # (B, V, 3)


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    J_regressor: jax.Array,
    parents: jax.Array,
    lbs_weights: jax.Array,
    pose2rot: bool = True,
) -> LBSOutput:
    """Full linear blend skinning.

    Args:
      betas: (B, num_betas)
      pose: (B, (J)*3) axis-angle (incl. global orient) if pose2rot, else
        (B, J, 3, 3) rotation matrices.
      v_template: (V, 3)
      shapedirs: (V, 3, num_betas)
      posedirs: (P, V*3) pose-blendshape basis, P = 9*(J-1)
      J_regressor: (J, V)
      parents: (J,)
      lbs_weights: (V, J)
    """
    B = max(betas.shape[0], pose.shape[0])
    J = J_regressor.shape[0]

    shape_offsets = blend_shapes(betas, shapedirs)  # (B, V, 3)
    v_shaped = v_template[None] + shape_offsets

    joints_rest = vertices2joints(J_regressor, v_shaped)  # (B, J, 3)

    if pose2rot:
        rot_mats = rodrigues(pose.reshape(B, -1, 3))  # (B, J, 3, 3)
    else:
        rot_mats = pose.reshape(B, -1, 3, 3)

    eye = jnp.eye(3, dtype=v_template.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)  # (B, 9*(J-1))
    pose_offsets = jnp.matmul(pose_feature, posedirs,
                              precision=jax.lax.Precision.HIGHEST).reshape(B, -1, 3)  # (B, V, 3)

    v_posed = v_shaped + pose_offsets

    posed_joints, A = rigid_transform_chain(rot_mats, joints_rest, parents)

    # Per-vertex transform: blend of joint transforms (MXU matmul). The
    # blend runs on FLAT (B, J, 16) -> (B, V, 16) transforms and the
    # skinning application on its channel slices: a (B, V, 4, 4) operand
    # tiles the trailing dims at 3-12% lane utilisation (8-32x the bytes;
    # see models/warp.py flat-16 helpers). The public 4x4 view below is a
    # boundary reshape that cancels against prepare_frame's flat read.
    W = lbs_weights.astype(A.dtype)  # (V, J)
    B_, J_ = A.shape[:2]
    T16 = jnp.einsum("vj,bjc->bvc", W, A.reshape(B_, J_, 16),
                     precision=jax.lax.Precision.HIGHEST)  # (B, V, 16)
    t = [T16[..., c] for c in range(12)]
    px, py, pz = v_posed[..., 0], v_posed[..., 1], v_posed[..., 2]
    verts = jnp.stack(
        [t[0] * px + t[1] * py + t[2] * pz + t[3],
         t[4] * px + t[5] * py + t[6] * pz + t[7],
         t[8] * px + t[9] * py + t[10] * pz + t[11]], axis=-1)
    T = T16.reshape(B_, -1, 4, 4)

    return LBSOutput(
        vertices=verts,
        joints=posed_joints,
        joints_transform=A,
        vertices_transform=T,
        shape_offsets=shape_offsets,
        pose_offsets=pose_offsets,
    )
