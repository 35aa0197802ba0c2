"""Tests for the kNN op and the observation->canonical warp."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animnerf_tpu.data.synthetic import make_body_model, make_rig, random_pose_params
from animnerf_tpu.models.warp import (
    affine_inverse,
    blend_neighbour_transforms,
    prepare_frame,
    rays_to_root_frame,
    transform_points,
    unpose,
)
from animnerf_tpu.ops.knn import knn


def test_knn_exact_vs_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 100, 3)).astype(np.float32)
    verts = rng.normal(size=(2, 50, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(pts), jnp.asarray(verts), k=4)
    # numpy oracle
    diff = pts[:, :, None] - verts[:, None]
    dist = np.sqrt((diff**2).sum(-1))
    idx_ref = np.argsort(dist, axis=-1)[..., :4]
    d_ref = np.take_along_axis(dist, idx_ref, axis=-1)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-4)
    # indices can differ only on exact ties; distances must agree
    d_mine_ref = np.take_along_axis(dist, np.asarray(i), axis=-1)
    np.testing.assert_allclose(d_mine_ref, d_ref, atol=1e-4)


def test_knn_tiled_matches_untiled():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(1, 300, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    d1, i1 = knn(pts, verts, k=4, chunk=8192)
    d2, i2 = knn(pts, verts, k=4, chunk=128)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_affine_inverse():
    rng = np.random.default_rng(2)
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (5, 4, 4)).copy()
    T[:, :3, :3] += rng.normal(scale=0.2, size=(5, 3, 3)).astype(np.float32)
    T[:, :3, 3] = rng.normal(size=(5, 3)).astype(np.float32)
    Tinv = np.asarray(affine_inverse(jnp.asarray(T)))
    prod = np.einsum("bij,bjk->bik", T.astype(np.float64), Tinv.astype(np.float64))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (5, 4, 4)),
                               atol=1e-4)


def _frame_setup(seed=0, V=256, J=24):
    model = make_body_model(num_verts=V, num_joints=J, seed=seed)
    params = {k: jnp.asarray(v) for k, v in
              random_pose_params(J, batch=2, seed=seed).items()}
    tmpl_np = random_pose_params(J, batch=2, seed=seed + 100, scale=0.05)
    tmpl_np["transl"][:] = 0.0
    template = {k: jnp.asarray(v) for k, v in tmpl_np.items()}
    return model, params, template


def test_prepare_frame_root_inverse():
    """root_inv must invert the observed pelvis transform, and the rebase
    must be pose-invariant: the root-frame pelvis equals its rest-pose
    location regardless of global orient / transl."""
    model, params, template = _frame_setup()
    ctx = prepare_frame(model, params, template)

    import animnerf_tpu.smpl.body_model as bm

    obs = bm.forward(model, **params)
    prod = np.einsum("bij,bjk->bik",
                     np.asarray(ctx.root_inv, np.float64),
                     np.asarray(obs.joints_transform[:, 0], np.float64))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape),
                               atol=1e-4)

    # same body, different global orient/transl -> same root-frame pelvis
    params2 = dict(params)
    params2["global_orient"] = params["global_orient"] + 0.7
    params2["transl"] = params["transl"] + 3.0
    ctx2 = prepare_frame(model, params2, template)
    np.testing.assert_allclose(np.asarray(ctx.joints[:, 0]),
                               np.asarray(ctx2.joints[:, 0]), atol=1e-3)


def test_unpose_recovers_template_verts():
    """A point exactly on an observed vertex must unpose to (approximately)
    the corresponding template vertex — the defining property of the warp."""
    model, params, template = _frame_setup(seed=3)
    ctx = prepare_frame(model, params, template)
    # query the observed vertices themselves
    xyz = ctx.verts[:, ::17]  # subsample for speed
    xyz_cano, _, valid = unpose(ctx, xyz, k=4, dis_threshold=0.2)
    tmpl = np.asarray(ctx.verts_template[:, ::17])
    got = np.asarray(xyz_cano)
    v = np.asarray(valid)
    assert v.mean() > 0.9  # on-surface points are valid
    err = np.linalg.norm(got - tmpl, axis=-1)[v[..., 0] > 0]
    # kNN blending over a synthetic rig is approximate; median error should
    # be well under the 0.2 dis_threshold scale
    assert np.median(err) < 0.05, f"median unpose err {np.median(err)}"


def test_with_geometry_drops_morton_cache():
    """Mutating ctx geometry through with_geometry must invalidate the
    fused-warp Morton cache (stale cache => warping with old geometry)."""
    model, params, template = _frame_setup(seed=9)
    ctx = prepare_frame(model, params, template)
    primed = ctx.replace(verts_morton=ctx.verts,
                         table_morton=jnp.zeros((2, ctx.verts.shape[1], 4)))
    moved = primed.with_geometry(verts=primed.verts + 0.01)
    assert moved.verts_morton is None and moved.table_morton is None
    np.testing.assert_allclose(np.asarray(moved.verts),
                               np.asarray(primed.verts) + 0.01, rtol=1e-6)


def test_unpose_far_points_invalid():
    model, params, template = _frame_setup(seed=4)
    ctx = prepare_frame(model, params, template)
    far = jnp.ones((2, 8, 3)) * 50.0
    _, _, valid = unpose(ctx, far, dis_threshold=0.2)
    np.testing.assert_allclose(np.asarray(valid), 0.0)


def test_rays_root_frame_near_far_tightening():
    model, params, template = _frame_setup(seed=5)
    ctx = prepare_frame(model, params, template)
    rng = np.random.default_rng(0)
    o = rng.normal(scale=0.1, size=(2, 16, 3)).astype(np.float32) + np.array(
        [0, 0, 4], dtype=np.float32)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((2, 16, 1), 0.1, np.float32),
                           np.full((2, 16, 1), 10.0, np.float32)], -1)
    out = np.asarray(rays_to_root_frame(ctx, jnp.asarray(rays)))
    near, far = out[..., 6], out[..., 7]
    cam_dist = np.linalg.norm(out[..., :3], axis=-1)
    np.testing.assert_allclose(near, np.maximum(0.1, cam_dist - 1.0), atol=1e-4)
    np.testing.assert_allclose(far, np.minimum(10.0, cam_dist + 1.0), atol=1e-4)
    # direction norms preserved under (near-)rigid root transform
    np.testing.assert_allclose(np.linalg.norm(out[..., 3:6], axis=-1), 1.0,
                               atol=1e-3)


def test_batched_obs_template_forward_exact():
    """prepare_frame's single 2B-batched body forward must be bit-identical
    to two separate B-sized calls (the FK/LBS chain has no batch
    reductions), including through the mixed-key fallback."""
    import animnerf_tpu.smpl.body_model as bm
    from animnerf_tpu.models.warp import _forward_obs_template

    model, params, template = _frame_setup(seed=7)
    obs_b, tmpl_b = _forward_obs_template(model, params, template)
    obs_s = bm.forward(model, **params)
    tmpl_s = bm.forward(model, **template)
    for got, want in ((obs_b, obs_s), (tmpl_b, tmpl_s)):
        for leaf_g, leaf_w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(leaf_g),
                                          np.asarray(leaf_w))

    # mismatched key sets fall back to two calls (still exact)
    template2 = {k: v for k, v in template.items() if k != "transl"}
    obs_f, tmpl_f = _forward_obs_template(model, params, template2)
    tmpl_f_want = bm.forward(model, **template2)
    for leaf_g, leaf_w in zip(jax.tree.leaves(tmpl_f),
                              jax.tree.leaves(tmpl_f_want)):
        np.testing.assert_array_equal(np.asarray(leaf_g), np.asarray(leaf_w))


def _reference_available():
    return os.path.exists("/root/reference/models/anim_nerf.py")


@pytest.mark.skipif(not _reference_available(), reason="no reference repo")
def test_warp_parity_vs_reference(tmp_path):
    """End-to-end warp parity: our prepare_frame+unpose vs the reference's
    set_body_model / convert_to_body_model_space / clac_ober2cano_transform /
    unpose on an identical full-size synthetic SMPL (V=6890, J=24)."""
    import torch

    from animnerf_tpu.data.synthetic import make_rig
    from animnerf_tpu.smpl.loader import save_model_data
    import animnerf_tpu.smpl.body_model as bm

    rig = make_rig(num_verts=6890, num_joints=24, seed=9)
    pkl = tmp_path / "SMPL_NEUTRAL.pkl"
    save_model_data(str(pkl), rig)

    sys.path.insert(0, "/root/reference")
    try:
        from models.anim_nerf import AnimNeRF as RefAnimNeRF
    finally:
        sys.path.pop(0)

    ref = RefAnimNeRF(model_path=str(pkl), model_type="smpl", gender="neutral",
                      use_unpose=True, use_knn=False, use_fine=False)

    params_np = random_pose_params(24, batch=1, seed=21)
    tmpl_np = random_pose_params(24, batch=1, seed=22, scale=0.02)
    tmpl_np["betas"] = params_np["betas"].copy()
    tmpl_np["transl"][:] = 0.0

    tp = {k: torch.from_numpy(v) for k, v in params_np.items()}
    ttmpl = {k: torch.from_numpy(v) for k, v in tmpl_np.items()}
    ref.set_body_model(tp, ttmpl)

    rng = np.random.default_rng(5)
    rays_np = np.zeros((1, 4, 8), dtype=np.float32)
    rays_np[..., :3] = rng.normal(size=(1, 4, 3)) * 0.1 + [0, 0, 3]
    rays_np[..., 3:6] = [0, 0, -1]
    rays_np[..., 6] = 0.1
    rays_np[..., 7] = 10.0
    ref_rays = ref.convert_to_body_model_space(torch.from_numpy(rays_np))
    ref.clac_ober2cano_transform()

    # sample points near the (root-frame) body
    verts_rf = ref.verts.detach().numpy()
    pts = verts_rf[:, ::97] + rng.normal(scale=0.03,
                                         size=verts_rf[:, ::97].shape).astype(np.float32)
    with torch.no_grad():
        ref_unposed, _, ref_valid = ref.unpose(torch.from_numpy(pts))

    # ours
    model = bm.create(str(pkl), "smpl", "neutral")
    jparams = {k: jnp.asarray(v) for k, v in params_np.items()}
    jtmpl = {k: jnp.asarray(v) for k, v in tmpl_np.items()}
    ctx = prepare_frame(model, jparams, jtmpl)

    np.testing.assert_allclose(np.asarray(ctx.verts), verts_rf, atol=2e-4)
    our_rays = rays_to_root_frame(ctx, jnp.asarray(rays_np))
    np.testing.assert_allclose(np.asarray(our_rays), ref_rays.numpy(), atol=2e-4)

    xyz_cano, _, valid = unpose(ctx, jnp.asarray(pts), k=4, dis_threshold=0.2)
    np.testing.assert_allclose(np.asarray(valid), ref_valid.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xyz_cano), ref_unposed.numpy(),
                               atol=5e-4)


def test_knn_pallas_interpret_matches_bruteforce():
    """The fused TPU kernel, run in interpreter mode on CPU, must agree
    with the jnp brute-force path exactly."""
    from animnerf_tpu.ops.knn import knn_bruteforce
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(2, 700, 3)).astype(np.float32))
    d_ref, i_ref = knn_bruteforce(pts, verts, k=4)
    d_pl, i_pl = knn_pallas(pts, verts, k=4, tile_n=128, tile_v=256,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref), atol=2e-4)
    # indices may differ only on distance ties
    d_check = np.take_along_axis(
        np.linalg.norm(np.asarray(pts)[:, :, None] - np.asarray(verts)[:, None],
                       axis=-1),
        np.asarray(i_pl), axis=-1)
    np.testing.assert_allclose(d_check, np.asarray(d_ref), atol=2e-4)


def test_knn_pallas_cull_exact():
    """The AABB tile-cull must not change results — coherent ray-like
    points (most culls) and random points (few culls)."""
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(9)
    verts = jnp.asarray(rng.normal(scale=0.3, size=(2, 900, 3))
                        .astype(np.float32))
    # ray-like coherent points: consecutive samples along a few rays,
    # including background rays far from the cloud
    o = rng.normal(scale=2.0, size=(2, 8, 1, 3)).astype(np.float32)
    d = rng.normal(size=(2, 8, 1, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.linspace(0, 3, 48, dtype=np.float32).reshape(1, 1, 48, 1)
    pts = jnp.asarray((o + t * d).reshape(2, -1, 3))

    for p in (pts, jnp.asarray(rng.normal(size=(2, 384, 3)).astype(np.float32))):
        d_c, i_c = knn_pallas(p, verts, tile_n=128, tile_v=256,
                              interpret=True, cull=True)
        d_n, i_n = knn_pallas(p, verts, tile_n=128, tile_v=256,
                              interpret=True, cull=False)
        np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_n), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_n))


def test_knn_pallas_far_skip_semantics():
    """far_skip: points beyond the threshold from all verts may return
    approximate neighbours, but their distances must still exceed the
    threshold (so the downstream valid-mask is unchanged); near points must
    be exact."""
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(4)
    verts = jnp.asarray(rng.normal(scale=0.2, size=(1, 600, 3))
                        .astype(np.float32))
    near = rng.normal(scale=0.25, size=(1, 128, 3)).astype(np.float32)
    far = rng.normal(scale=0.25, size=(1, 128, 3)).astype(np.float32) + 5.0
    pts = jnp.asarray(np.concatenate([near, far], axis=1))

    thr = 0.2
    d_fs, i_fs = knn_pallas(pts, verts, tile_n=128, tile_v=256,
                            interpret=True, far_skip=thr)
    d_ex, i_ex = knn_pallas(pts, verts, tile_n=128, tile_v=256,
                            interpret=True, far_skip=0.0)

    # near tile: exact
    np.testing.assert_allclose(np.asarray(d_fs)[:, :128],
                               np.asarray(d_ex)[:, :128], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_fs)[:, :128],
                                  np.asarray(i_ex)[:, :128])
    # far tile: all reported distances beyond the threshold -> same
    # valid mask, and indices in range
    assert (np.asarray(d_fs)[:, 128:] > thr).all()
    assert ((np.asarray(d_fs) < thr) == (np.asarray(d_ex) < thr)).all()

def test_min_dist_pallas_interpret_matches_bruteforce():
    """The nearest-vertex-distance pre-pass kernel (sample-compaction
    validity test, render/inference.py) must agree with the jnp path."""
    from animnerf_tpu.ops.knn import min_vertex_distance_jnp
    from animnerf_tpu.ops.knn_pallas import min_dist_pallas

    rng = np.random.default_rng(9)
    pts = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(2, 700, 3)).astype(np.float32))
    d_ref = min_vertex_distance_jnp(pts, verts)
    d_pl = min_dist_pallas(pts, verts, tile_n=128, tile_v=256,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               atol=2e-4)


def test_keep_within_boxes_superset_of_exact():
    """The box pre-pass (render/inference.py validity test) must keep a
    SUPERSET of the exact (min dist < thr) mask — that containment is what
    makes the compacted render exact — and must actually prune: points far
    from every vertex must be dropped."""
    from animnerf_tpu.ops.knn import keep_within_boxes, min_vertex_distance_jnp

    rng = np.random.default_rng(11)
    verts = jnp.asarray(rng.normal(scale=0.4,
                                   size=(2, 700, 3)).astype(np.float32))
    pts = jnp.asarray(rng.normal(scale=1.5,
                                 size=(2, 4000, 3)).astype(np.float32))
    thr = 0.2
    exact = np.asarray(min_vertex_distance_jnp(pts, verts) < thr)
    for nb in (1, 7, 32, 64, 701):
        keep = np.asarray(keep_within_boxes(pts, verts, thr, nb=nb))
        assert not (exact & ~keep).any(), f"nb={nb} dropped a valid point"
    # with per-vertex boxes (nb >= V) the test is the L-inf ball union:
    # anything beyond sqrt(3)*thr of every vertex must be dropped
    d = np.asarray(min_vertex_distance_jnp(pts, verts))
    keep = np.asarray(keep_within_boxes(pts, verts, thr, nb=701))
    far = d > np.sqrt(3.0) * thr
    assert not (far & keep).any()
    # and the box mask prunes most of this scattered cloud
    assert keep.mean() < 0.8


@pytest.mark.slow
def test_fused_prepass_boxes_matches_exact(tmp_path):
    """The fused compacted render must produce identical images with the
    box pre-pass and the exact min-dist pre-pass (the box mask is a
    superset; extras sigma-fill in the warp)."""
    from animnerf_tpu.models.body_params import init_body_params
    from animnerf_tpu.render.inference import Renderer
    from animnerf_tpu.training.system import AnimNeRFSystem
    from animnerf_tpu.config import finalize, get_default_config

    cfg = get_default_config()
    cfg.n_samples = 8
    cfg.n_importance = 4
    cfg.use_view = False
    cfg.freqs_dir = 0
    cfg.train.frame_start_ID = 1
    cfg.train.frame_end_ID = 2
    cfg.train.frame_skip = 1
    cfg = finalize(cfg)
    body_model = make_body_model(num_verts=128, num_joints=12, seed=0)
    system = AnimNeRFSystem(cfg, body_model)
    params = system.init_params(
        jax.random.PRNGKey(0), init_body_params(cfg.num_frames, pose_dim=33))
    bp = {k: jnp.asarray(v) for k, v in
          random_pose_params(12, batch=1, seed=1).items()}
    tmpl = {k: jnp.asarray(v) for k, v in
            random_pose_params(12, batch=1, seed=2).items()}
    tmpl = dict(tmpl, transl=jnp.zeros_like(tmpl["transl"]))

    rng = np.random.default_rng(3)
    o = rng.normal(scale=0.1, size=(64, 3)).astype(np.float32)
    o[:, 2] += 3.0
    d = -o + rng.normal(scale=0.05, size=o.shape).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((64, 1), 0.1, np.float32),
         np.full((64, 1), 10.0, np.float32)], axis=-1)

    outs = {}
    for mode in ("boxes", "exact"):
        r = Renderer(system)
        r.cull_rays = False
        r.compact_quantum = 32
        r.prepass = mode
        assert r._compaction_applicable()
        outs[mode] = r.render_frame(params, bp, tmpl, rays)
    for a, b in zip(outs["boxes"], outs["exact"]):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_ndc_rays_projection_properties():
    """NDC conversion (reference utils/ray_utils.py:124-164): origins land
    on the z = -1 near face, and points along each world ray map onto the
    corresponding NDC line (the projection is a line-preserving map):
    project(o + t*d) == o_ndc + t'*d_ndc for some t' in [0, 1)."""
    from animnerf_tpu.ops.ray_utils import ndc_rays

    rng = np.random.default_rng(4)
    H = W = 64
    focal = 80.0
    o = np.array([[0.1, -0.2, 0.0], [0.0, 0.0, 0.5]], np.float32)
    d = np.stack([rng.normal(scale=0.2, size=2).astype(np.float32),
                  rng.normal(scale=0.2, size=2).astype(np.float32),
                  -np.ones(2, np.float32)], axis=-1)
    near = 1.0
    o_n, d_n = ndc_rays(H, W, focal, near, o, d)
    # shifted origin sits on the near plane => o2 = 1 + 2*near/(-near) = -1
    np.testing.assert_allclose(o_n[:, 2], -1.0, atol=1e-6)

    def project(p):
        return np.stack([-2 * focal / W * p[..., 0] / p[..., 2],
                         -2 * focal / H * p[..., 1] / p[..., 2],
                         1.0 + 2.0 * near / p[..., 2]], axis=-1)

    # t beyond the near-plane shift (max (near + o_z)/|d_z| = 1.5 here),
    # so every tested point lies in front of the shifted origin
    for t in (2.0, 3.0, 10.0):
        p = o + t * d
        q = project(p)                      # the world point in NDC
        # q must lie on the NDC ray: (q - o_n) parallel to d_n
        lam = (q - o_n)[:, 2] / d_n[:, 2]
        np.testing.assert_allclose(q, o_n + lam[:, None] * d_n, atol=1e-5)
        assert (lam >= 0).all() and (lam < 1).all()  # far=inf -> t'=1


def test_knn_pallas_packed_quantization_bound():
    """Packed-key kernel: per-rank distances within the 13-dropped-bit
    quantization bound of the exact brute force (<= 2^-10 rel on d2), and
    every reported index's TRUE distance also within that bound of the
    exact rank distance (winners are exact under quantized ordering)."""
    from animnerf_tpu.ops.knn import knn_bruteforce
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(2, 384, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(2, 700, 3)).astype(np.float32))
    d_ref, _ = knn_bruteforce(pts, verts, k=4)
    d_pk, i_pk = knn_pallas(pts, verts, k=4, tile_n=128, tile_v=256,
                            interpret=True, packed=True)
    d_ref = np.asarray(d_ref)
    rel = 2.0 ** -10  # on d2 => ~2^-11 on d; allow 2x slack for rank swaps
    np.testing.assert_allclose(np.asarray(d_pk), d_ref,
                               rtol=2 * rel, atol=1e-6)
    d_true_at_idx = np.take_along_axis(
        np.linalg.norm(np.asarray(pts)[:, :, None] - np.asarray(verts)[:, None],
                       axis=-1),
        np.asarray(i_pk), axis=-1)
    np.testing.assert_allclose(d_true_at_idx, d_ref, rtol=2 * rel, atol=1e-6)
    # ascending order must hold
    assert (np.diff(np.asarray(d_pk), axis=-1) >= -1e-6).all()


def test_knn_pallas_packed_exact_on_separated_rig():
    """With vertex spacings far coarser than the quantization step the
    packed kernel must return bit-identical indices to brute force."""
    from animnerf_tpu.ops.knn import knn_bruteforce
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(12)
    # grid vertices with >=0.5 spacing; query points jittered off-grid
    g = np.stack(np.meshgrid(*[np.arange(6, dtype=np.float32)] * 3,
                             indexing="ij"), -1).reshape(-1, 3)
    verts = jnp.asarray(np.tile(g[None], (1, 1, 1)))
    pts = jnp.asarray(
        (g[rng.integers(0, len(g), 200)]
         + rng.uniform(0.05, 0.2, size=(200, 3))).astype(np.float32)[None])
    d_ref, i_ref = knn_bruteforce(pts, verts, k=4)
    d_pk, i_pk = knn_pallas(pts, verts, k=4, tile_n=128, tile_v=256,
                            interpret=True, packed=True)
    np.testing.assert_array_equal(np.asarray(i_pk), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_pk), np.asarray(d_ref),
                               rtol=2.0 ** -9, atol=1e-6)


def test_knn_pallas_packed_far_skip_semantics():
    """far_skip under the packed kernel: far points report distances > thr
    with index 0; the valid mask matches the exact kernel's."""
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(13)
    verts = jnp.asarray(rng.normal(scale=0.2, size=(1, 600, 3))
                        .astype(np.float32))
    near = rng.normal(scale=0.25, size=(1, 128, 3)).astype(np.float32)
    far = rng.normal(scale=0.25, size=(1, 128, 3)).astype(np.float32) + 5.0
    pts = jnp.asarray(np.concatenate([near, far], axis=1))

    thr = 0.2
    d_fs, i_fs = knn_pallas(pts, verts, tile_n=128, tile_v=256,
                            interpret=True, far_skip=thr, packed=True)
    d_ex, _ = knn_pallas(pts, verts, tile_n=128, tile_v=256,
                         interpret=True, far_skip=0.0)
    assert (np.asarray(d_fs)[:, 128:] > thr).all()
    assert (np.asarray(i_fs)[:, 128:] == 0).all()
    assert ((np.asarray(d_fs) < thr) == (np.asarray(d_ex) < thr)).all()


def test_knn_pallas_transposed_out():
    import numpy as np

    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(2, 150, 3)).astype(np.float32))
    d, i = knn_pallas(pts, verts, k=4, tile_n=256, tile_v=128,
                      interpret=True)
    d_t, i_t = knn_pallas(pts, verts, k=4, tile_n=256, tile_v=128,
                          interpret=True, transposed_out=True)
    np.testing.assert_array_equal(np.asarray(i_t.transpose(0, 2, 1)),
                                  np.asarray(i))
    np.testing.assert_allclose(np.asarray(d_t.transpose(0, 2, 1)),
                               np.asarray(d), atol=0)


def test_knn_pallas_points_t_in():
    import numpy as np

    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(2, 150, 3)).astype(np.float32))
    d, i = knn_pallas(pts, verts, k=4, tile_n=256, tile_v=128,
                      interpret=True, transposed_out=True)
    d2, i2 = knn_pallas(pts.transpose(0, 2, 1), verts, k=4, tile_n=256,
                        tile_v=128, interpret=True, transposed_out=True,
                        points_t_in=True)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=0)


def test_knn_pallas_packed_large_v_downgrades_to_unpacked():
    """packed=True with a vertex cloud too big for the 13-bit index field
    (e.g. SMPL-X: V=10475) must silently take the unpacked kernel — exact,
    unquantized distances — instead of asserting or corrupting keys."""
    from animnerf_tpu.ops.knn import knn_bruteforce
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(17)
    pts = jnp.asarray(rng.normal(size=(1, 128, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(1, 10475, 3)).astype(np.float32))
    d_ref, _ = knn_bruteforce(pts, verts, k=4)
    d_pl, i_pl = knn_pallas(pts, verts, k=4, tile_n=128, tile_v=512,
                            interpret=True, packed=True)
    # unpacked result: full f32 precision, NOT the 2^-10 quantization the
    # packed key would impose (and no 13-bit index overflow corruption)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               atol=2e-4)
    d_true_at_idx = np.take_along_axis(
        np.linalg.norm(np.asarray(pts)[:, :, None]
                       - np.asarray(verts)[:, None], axis=-1),
        np.asarray(i_pl), axis=-1)
    np.testing.assert_allclose(d_true_at_idx, np.asarray(d_ref), atol=2e-4)
    assert int(np.max(np.asarray(i_pl))) < 10475


def test_knn_pallas_tournament_bit_equal_to_extract_min():
    """The bitonic tournament kernel (packed, k=4, power-of-two tile_v)
    must return bit-identical distances AND indices to the extract-min
    packed kernel: keys are distinct, so top-4 is comparison-order
    independent. Also cover the far_skip branch."""
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.default_rng(23)
    pts = jnp.asarray(rng.normal(size=(2, 384, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(2, 700, 3)).astype(np.float32))
    for fs in (0.0, 0.5):
        d_em, i_em = knn_pallas(pts, verts, k=4, tile_n=128, tile_v=256,
                                interpret=True, packed=True, far_skip=fs,
                                tournament=False)
        d_t, i_t = knn_pallas(pts, verts, k=4, tile_n=128, tile_v=256,
                              interpret=True, packed=True, far_skip=fs,
                              tournament=True)
        np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_em))
        np.testing.assert_array_equal(np.asarray(d_t), np.asarray(d_em))
