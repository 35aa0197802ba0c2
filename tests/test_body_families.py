"""SMPL-H / SMPL-X model-family tests (hand PCA, extended pose vectors)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import animnerf_tpu.smpl.body_model as bm
from animnerf_tpu.data.synthetic import make_body_model
from animnerf_tpu.models.body_params import PARAM_DIMS, init_body_params
from animnerf_tpu.models.warp import prepare_frame, unpose


def _params(model_type, B=2, seed=0):
    rng = np.random.default_rng(seed)
    dims = PARAM_DIMS[model_type]
    p = {k: jnp.asarray(rng.normal(scale=0.1, size=(B, d)).astype(np.float32))
         for k, d in dims.items()}
    p["betas"] = jnp.asarray(rng.normal(scale=0.3, size=(B, 10)).astype(np.float32))
    return p


@pytest.mark.parametrize("model_type", ["smplh", "smplx"])
def test_forward_shapes(model_type):
    model = make_body_model(num_verts=128, model_type=model_type, seed=2)
    J = model.num_joints
    assert J == (52 if model_type == "smplh" else 55)
    p = _params(model_type)
    out = bm.forward(model, **p)
    assert out.vertices.shape == (2, 128, 3)
    assert out.joints_transform.shape == (2, J, 4, 4)
    assert out.vertices_transform.shape == (2, 128, 4, 4)
    assert np.isfinite(np.asarray(out.vertices)).all()


@pytest.mark.parametrize("model_type", ["smplh", "smplx"])
def test_hand_pca_moves_hand_joints(model_type):
    """Changing hand PCA coefficients must change the output (hand joints
    articulated through the PCA basis, reference body_models.py:723-732)."""
    model = make_body_model(num_verts=128, model_type=model_type, seed=3)
    p = _params(model_type)
    out1 = bm.forward(model, **p)
    p2 = dict(p, left_hand_pose=p["left_hand_pose"] + 1.0)
    out2 = bm.forward(model, **p2)
    assert not np.allclose(np.asarray(out1.vertices), np.asarray(out2.vertices))


def test_smplh_warp_pipeline():
    """prepare_frame + unpose work end-to-end for smplh."""
    model = make_body_model(num_verts=160, model_type="smplh", seed=4)
    p = _params("smplh", seed=5)
    tmpl = _params("smplh", seed=6)
    tmpl = dict(tmpl, transl=jnp.zeros_like(tmpl["transl"]),
                betas=p["betas"])
    ctx = prepare_frame(model, p, tmpl)
    xyz = ctx.verts[:, ::13]
    cano, _, valid = unpose(ctx, xyz)
    assert np.asarray(valid).mean() > 0.8
    assert np.isfinite(np.asarray(cano)).all()


def test_init_body_params_dims():
    for mt, dims in PARAM_DIMS.items():
        p = init_body_params(5, mt)
        assert p["betas"].shape == (1, 10)
        for k, d in dims.items():
            expected = (1, d) if k == "betas" else (5, d)
            assert p[k].shape == expected, (mt, k)


@pytest.mark.parametrize("model_type", ["mano", "flame"])
def test_mano_flame_forward_shapes(model_type):
    """MANO (hand rig, 16 joints, PCA pose) and FLAME (head rig, 5 joints)
    forwards produce the full six-tuple (reference smplx/body_models.py
    MANO/FLAME families return the same modified outputs)."""
    model = make_body_model(num_verts=96, model_type=model_type, seed=11)
    J = model.num_joints
    assert J == (16 if model_type == "mano" else 5)
    p = _params(model_type, seed=12)
    out = bm.forward(model, **p)
    assert out.vertices.shape == (2, 96, 3)
    assert out.joints_transform.shape == (2, J, 4, 4)
    assert out.vertices_transform.shape == (2, 96, 4, 4)
    assert out.shape_offsets.shape == (2, 96, 3)
    assert out.pose_offsets.shape == (2, 96, 3)
    assert np.isfinite(np.asarray(out.vertices)).all()


def test_mano_pca_articulates():
    """MANO finger pose flows through the PCA basis into the vertices."""
    model = make_body_model(num_verts=96, model_type="mano", seed=13)
    p = _params("mano", seed=14)
    out1 = bm.forward(model, **p)
    out2 = bm.forward(model, **dict(p, hand_pose=p["hand_pose"] + 1.0))
    assert not np.allclose(np.asarray(out1.vertices),
                           np.asarray(out2.vertices))


def test_flame_jaw_and_neck_articulate():
    model = make_body_model(num_verts=96, model_type="flame", seed=15)
    p = _params("flame", seed=16)
    out1 = bm.forward(model, **p)
    for key in ("jaw_pose", "neck_pose", "leye_pose"):
        out2 = bm.forward(model, **dict(p, **{key: p[key] + 0.7}))
        assert not np.allclose(np.asarray(out1.vertices),
                               np.asarray(out2.vertices)), key


def test_flame_expression_blendshapes():
    """With fused shape+expression dirs (20 cols), expression deforms the
    mesh but must NOT move the skeleton pose (pure blendshape)."""
    model = make_body_model(num_verts=96, num_betas=20, model_type="flame",
                            seed=17)
    p = _params("flame", seed=18)
    out1 = bm.forward(model, **p)
    out2 = bm.forward(model, **dict(p, expression=p["expression"] + 1.0))
    assert not np.allclose(np.asarray(out1.vertices),
                           np.asarray(out2.vertices))


@pytest.mark.parametrize("model_type", ["mano", "flame"])
def test_mano_flame_warp_pipeline(model_type):
    """prepare_frame + unpose run end-to-end on the hand/head rigs: points
    on the observed surface warp to finite canonical coords and are valid."""
    model = make_body_model(num_verts=96, model_type=model_type, seed=19)
    p = _params(model_type, seed=20)
    tmpl = _params(model_type, seed=21)
    tmpl = dict(tmpl, transl=jnp.zeros_like(tmpl["transl"]),
                betas=p["betas"])
    ctx = prepare_frame(model, p, tmpl)
    xyz = ctx.verts[:, ::7]
    cano, _, valid = unpose(ctx, xyz)
    assert np.asarray(valid).mean() > 0.8
    assert np.isfinite(np.asarray(cano)).all()


def test_joint_names_match_reference_table():
    """Our generated table must equal the reference's literal 144-name
    list when the reference checkout is present (skipped otherwise)."""
    import os

    import pytest

    from animnerf_tpu.smpl.joint_names import (
        full_joint_names,
        joint_index,
        joint_names,
    )

    assert len(full_joint_names()) == 144
    assert joint_names("smpl")[0] == "pelvis" and len(joint_names("smpl")) == 24
    assert len(joint_names("smplh")) == 52
    assert len(joint_names("smplx")) == 55
    assert joint_index("nose") == 55

    ref = "/root/reference/smplx/joint_names.py"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not present")
    ns: dict = {}
    exec(open(ref).read(), ns)  # the file is a single list literal
    assert list(full_joint_names()) == ns["JOINT_NAMES"]


def test_layer_variant_rotmat_input_matches_axis_angle():
    """pose2rot=False (the reference's SMPL*Layer semantics,
    body_models.py:414-475): feeding rodrigues(axis-angle) as rotation
    matrices must reproduce the axis-angle forward exactly, for the body
    and for full-rotation hands."""
    import jax.numpy as jnp
    import numpy as np

    from animnerf_tpu.data.synthetic import make_body_model
    from animnerf_tpu.smpl import body_model as bm
    from animnerf_tpu.smpl.lbs import rodrigues

    rng = np.random.default_rng(0)
    B = 2

    for mt, pose_dim in (("smpl", 69), ("smplh", 63)):
        model = make_body_model(num_verts=200, seed=1, model_type=mt)
        betas = jnp.asarray(rng.normal(scale=0.3, size=(B, 10)).astype(np.float32))
        go = jnp.asarray(rng.normal(scale=0.4, size=(B, 3)).astype(np.float32))
        body = jnp.asarray(rng.normal(scale=0.2, size=(B, pose_dim)).astype(np.float32))
        transl = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))

        kwargs = dict(betas=betas, global_orient=go, body_pose=body,
                      transl=transl)
        if mt == "smplh":
            # axis-angle path decodes PCA: zero coefficients resolve to
            # the hand MEAN pose; the Layer variant must be fed
            # rodrigues(mean) to match (full rotations, no PCA decode)
            n_pca = model.hand_components_l.shape[0]
            zero_pca = jnp.zeros((B, n_pca))
            kwargs.update(left_hand_pose=zero_pca, right_hand_pose=zero_pca)

        out_aa = bm.forward(model, **kwargs)

        rkw = dict(kwargs)
        rkw["global_orient"] = rodrigues(go.reshape(B, 1, 3))
        rkw["body_pose"] = rodrigues(body.reshape(B, -1, 3))
        if mt == "smplh":
            lh = rodrigues(jnp.broadcast_to(
                model.hand_mean_l.reshape(15, 3), (B, 15, 3)))
            rh = rodrigues(jnp.broadcast_to(
                model.hand_mean_r.reshape(15, 3), (B, 15, 3)))
            rkw.update(left_hand_pose=lh, right_hand_pose=rh)
        out_rm = bm.forward(model, pose2rot=False, **rkw)

        np.testing.assert_allclose(np.asarray(out_aa.vertices),
                                   np.asarray(out_rm.vertices), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_aa.joints),
                                   np.asarray(out_rm.joints), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_aa.vertices_transform),
                                   np.asarray(out_rm.vertices_transform),
                                   atol=1e-5)
