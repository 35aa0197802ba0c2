"""Functional SMPL / SMPL-H / SMPL-X body models.

TPU-native re-design of the reference's (modified) smplx package
(/root/reference/smplx/body_models.py). Behavioural parity targets:
  * forward returns per-vertex transforms T, per-joint transforms A, and
    shape/pose blendshape offsets in addition to vertices/joints
    (reference body_models.py:359-385 — the Anim-NeRF modification)
  * translation is folded into vertices, joints, and the translation
    column of A and T (body_models.py:370-374)
  * joints = skeleton joints ++ extra keypoint vertices
    (vertex_joint_selector.py:73-77)
  * SMPL-H/X hand poses go through a PCA basis plus the model's mean hand
    pose (body_models.py:723-732)

The model itself is an immutable pytree (``BodyModel``) so it can be closed
over, donated, or sharded like any other array collection; ``forward`` is a
pure function suitable for jit/vmap/grad.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from animnerf_tpu.smpl import lbs as lbs_mod
from animnerf_tpu.smpl.loader import load_model_data
from animnerf_tpu.smpl.vertex_ids import extra_joint_ids

# Number of skeleton joints driven by LBS (incl. root) per model family.
NUM_JOINTS = {"smpl": 24, "smplh": 52, "smplx": 55, "mano": 16, "flame": 5}
NUM_BODY_JOINTS = {"smpl": 23, "smplh": 21, "smplx": 21}


@struct.dataclass
class BodyModel:
    """Immutable SMPL-family model data (a pytree of arrays)."""

    v_template: jax.Array      # (V, 3)
    shapedirs: jax.Array       # (V, 3, num_betas)
    posedirs: jax.Array        # (9*(J-1), V*3)
    J_regressor: jax.Array     # (J, V)
    lbs_weights: jax.Array     # (V, J)
    parents: np.ndarray = struct.field(pytree_node=False)      # (J,) host ints
    faces: np.ndarray = struct.field(pytree_node=False)        # (F, 3)
    extra_joint_idxs: np.ndarray = struct.field(pytree_node=False)  # (E,)
    model_type: str = struct.field(pytree_node=False, default="smpl")
    gender: str = struct.field(pytree_node=False, default="neutral")
    # SMPL-H/X hand PCA (None for SMPL)
    hand_components_l: Optional[jax.Array] = None   # (P, 45)
    hand_components_r: Optional[jax.Array] = None
    hand_mean_l: Optional[jax.Array] = None         # (45,)
    hand_mean_r: Optional[jax.Array] = None
    flat_hand_mean: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]


@struct.dataclass
class BodyModelOutput:
    vertices: jax.Array            # (B, V, 3)
    joints: jax.Array              # (B, J+E, 3)
    joints_transform: jax.Array    # (B, J, 4, 4)
    vertices_transform: jax.Array  # (B, V, 4, 4)
    shape_offsets: jax.Array       # (B, V, 3)
    pose_offsets: jax.Array        # (B, V, 3)
    full_pose: Optional[jax.Array] = None


def create(model_path: str, model_type: str = "smpl", gender: str = "neutral",
           num_betas: int = 10, num_pca_comps: int = 6,
           flat_hand_mean: bool = False) -> BodyModel:
    """Load a body model from disk (same layout the reference consumes;
    see reference smplx/__init__.py:17-30, body_models.py:2395-2457)."""
    data = load_model_data(model_path, model_type, gender, num_betas=num_betas)
    kwargs = {}
    if model_type in ("smplh", "smplx") and "hand_components_l" in data:
        ncomp = num_pca_comps
        kwargs.update(
            hand_components_l=jnp.asarray(data["hand_components_l"][:ncomp]),
            hand_components_r=jnp.asarray(data["hand_components_r"][:ncomp]),
            hand_mean_l=jnp.asarray(data["hand_mean_l"]),
            hand_mean_r=jnp.asarray(data["hand_mean_r"]),
            flat_hand_mean=flat_hand_mean,
        )
    return BodyModel(
        v_template=jnp.asarray(data["v_template"]),
        shapedirs=jnp.asarray(data["shapedirs"]),
        posedirs=jnp.asarray(data["posedirs"]),
        J_regressor=jnp.asarray(data["J_regressor"]),
        lbs_weights=jnp.asarray(data["lbs_weights"]),
        parents=np.asarray(data["parents"]),
        faces=np.asarray(data["faces"]),
        extra_joint_idxs=extra_joint_ids(model_type),
        model_type=model_type,
        gender=gender,
        **kwargs,
    )


def _hand_pose(model: BodyModel, pose_pca: jax.Array, side: str) -> jax.Array:
    comps = model.hand_components_l if side == "l" else model.hand_components_r
    mean = model.hand_mean_l if side == "l" else model.hand_mean_r
    full = pose_pca @ comps  # (B, 45)
    if not model.flat_hand_mean:
        full = full + mean
    return full


def forward(
    model: BodyModel,
    betas: jax.Array,            # (B, num_betas)
    global_orient: jax.Array,    # (B, 3)
    body_pose: Optional[jax.Array] = None,  # (B, 69) smpl / (B, 63) smplh|x
    transl: Optional[jax.Array] = None,  # (B, 3)
    left_hand_pose: Optional[jax.Array] = None,   # (B, P) PCA coeffs
    right_hand_pose: Optional[jax.Array] = None,
    hand_pose: Optional[jax.Array] = None,        # (B, P) mano
    jaw_pose: Optional[jax.Array] = None,         # (B, 3) smplx/flame
    neck_pose: Optional[jax.Array] = None,        # (B, 3) flame
    leye_pose: Optional[jax.Array] = None,
    reye_pose: Optional[jax.Array] = None,
    expression: Optional[jax.Array] = None,       # (B, 10) smplx/flame
    pose2rot: bool = True,
    **_: object,
) -> BodyModelOutput:
    """Pose the body model. Pure function of (model, params).

    pose2rot=False is the reference's `*Layer` variant semantics
    (smplx/body_models.py:414,475): every pose argument is rotation
    MATRICES — (B, n, 3, 3) or flat (B, n*9) — instead of axis-angle,
    and hand poses are full per-joint rotations (no PCA decode)."""
    B = betas.shape[0]
    if not pose2rot:
        return _forward_rotmats(
            model, betas, global_orient, body_pose, transl,
            left_hand_pose, right_hand_pose, hand_pose, jaw_pose,
            neck_pose, leye_pose, reye_pose, expression)
    zeros3 = jnp.zeros((B, 3), dtype=betas.dtype)

    if model.model_type == "smpl":
        full_pose = jnp.concatenate([global_orient, body_pose], axis=1)
    elif model.model_type == "mano":
        # hand-only rig: global orient + 15 finger joints via PCA
        hp = hand_pose if hand_pose is not None else left_hand_pose
        hand = _hand_pose(model, hp, "l") if model.hand_components_l is not None \
            else hp
        full_pose = jnp.concatenate([global_orient, hand], axis=1)
    elif model.model_type == "flame":
        # head rig: global orient + neck + jaw + two eyes
        parts = [global_orient,
                 neck_pose if neck_pose is not None else zeros3,
                 jaw_pose if jaw_pose is not None else zeros3,
                 leye_pose if leye_pose is not None else zeros3,
                 reye_pose if reye_pose is not None else zeros3]
        full_pose = jnp.concatenate(parts, axis=1)
    elif model.model_type == "smplh":
        lh = _hand_pose(model, left_hand_pose, "l")
        rh = _hand_pose(model, right_hand_pose, "r")
        full_pose = jnp.concatenate([global_orient, body_pose, lh, rh], axis=1)
    elif model.model_type == "smplx":
        lh = _hand_pose(model, left_hand_pose, "l")
        rh = _hand_pose(model, right_hand_pose, "r")
        jaw = jaw_pose if jaw_pose is not None else zeros3
        leye = leye_pose if leye_pose is not None else zeros3
        reye = reye_pose if reye_pose is not None else zeros3
        full_pose = jnp.concatenate(
            [global_orient, body_pose, jaw, leye, reye, lh, rh], axis=1
        )
    else:
        raise ValueError(f"unknown model_type {model.model_type!r}")

    shape_coeffs = betas
    shapedirs = model.shapedirs
    if model.model_type in ("smplx", "flame") and expression is not None:
        # SMPL-X/FLAME concatenate expression dirs after the shape dirs;
        # loaders that ship them fused can pass a wider shapedirs.
        if shapedirs.shape[-1] >= betas.shape[-1] + expression.shape[-1]:
            shape_coeffs = jnp.concatenate([betas, expression], axis=-1)
            shapedirs = shapedirs[..., : shape_coeffs.shape[-1]]

    out = lbs_mod.lbs(
        shape_coeffs,
        full_pose,
        model.v_template,
        shapedirs,
        model.posedirs,
        model.J_regressor,
        model.parents,
        model.lbs_weights,
        pose2rot=True,
    )

    # Append extra keypoint joints drawn from mesh vertices.
    extra = out.vertices[:, model.extra_joint_idxs]
    joints = jnp.concatenate([out.joints, extra], axis=1)

    vertices, A, T = out.vertices, out.joints_transform, out.vertices_transform
    if transl is not None:
        t = transl[:, None]
        vertices = vertices + t
        joints = joints + t
        A = A.at[..., :3, 3].add(t)
        T = T.at[..., :3, 3].add(t)

    return BodyModelOutput(
        vertices=vertices,
        joints=joints,
        joints_transform=A,
        vertices_transform=T,
        shape_offsets=out.shape_offsets,
        pose_offsets=out.pose_offsets,
        full_pose=full_pose,
    )


def _forward_rotmats(model: BodyModel, betas, global_orient, body_pose,
                     transl, left_hand_pose, right_hand_pose, hand_pose,
                     jaw_pose, neck_pose, leye_pose, reye_pose,
                     expression) -> BodyModelOutput:
    """pose2rot=False body: every pose piece is (B, n, 3, 3) / (B, n*9)
    rotation matrices, hands are full 15-joint rotations (reference Layer
    classes, smplx/body_models.py:414-475)."""
    B = betas.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=betas.dtype), (B, 1, 3, 3))

    def rots(x, n):
        if x is None:
            return jnp.broadcast_to(eye, (B, n, 3, 3))
        return x.reshape(B, n, 3, 3)

    go = rots(global_orient, 1)
    mt = model.model_type
    if mt == "smpl":
        parts = [go, rots(body_pose, model.num_joints - 1)]
    elif mt == "mano":
        hp = hand_pose if hand_pose is not None else left_hand_pose
        parts = [go, rots(hp, 15)]
    elif mt == "flame":
        parts = [go, rots(neck_pose, 1), rots(jaw_pose, 1),
                 rots(leye_pose, 1), rots(reye_pose, 1)]
    elif mt == "smplh":
        parts = [go, rots(body_pose, 21), rots(left_hand_pose, 15),
                 rots(right_hand_pose, 15)]
    elif mt == "smplx":
        parts = [go, rots(body_pose, 21), rots(jaw_pose, 1),
                 rots(leye_pose, 1), rots(reye_pose, 1),
                 rots(left_hand_pose, 15), rots(right_hand_pose, 15)]
    else:
        raise ValueError(f"unknown model_type {mt!r}")
    full_pose = jnp.concatenate(parts, axis=1)  # (B, J, 3, 3)

    shape_coeffs = betas
    shapedirs = model.shapedirs
    if mt in ("smplx", "flame") and expression is not None:
        if shapedirs.shape[-1] >= betas.shape[-1] + expression.shape[-1]:
            shape_coeffs = jnp.concatenate([betas, expression], axis=-1)
            shapedirs = shapedirs[..., : shape_coeffs.shape[-1]]

    out = lbs_mod.lbs(
        shape_coeffs, full_pose, model.v_template, shapedirs,
        model.posedirs, model.J_regressor, model.parents,
        model.lbs_weights, pose2rot=False)

    extra = out.vertices[:, model.extra_joint_idxs]
    joints = jnp.concatenate([out.joints, extra], axis=1)
    vertices, A, T = out.vertices, out.joints_transform, out.vertices_transform
    if transl is not None:
        t = transl[:, None]
        vertices = vertices + t
        joints = joints + t
        A = A.at[..., :3, 3].add(t)
        T = T.at[..., :3, 3].add(t)
    return BodyModelOutput(
        vertices=vertices, joints=joints, joints_transform=A,
        vertices_transform=T, shape_offsets=out.shape_offsets,
        pose_offsets=out.pose_offsets, full_pose=full_pose)
