"""Tests for the fused gather+blend op and its scatter-free backward."""

import numpy as np

import jax
import jax.numpy as jnp

from animnerf_tpu.ops.blend import (
    _gather_blend_impl,
    gather_blend,
    weighted_scatter_rows_jnp,
    weighted_scatter_rows_pallas,
)


def _rand_inputs(seed=0, B=2, N=300, V=700, k=4, F=16):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, V, size=(B, N, k)).astype(np.int32)
    w = rng.uniform(size=(B, N, k)).astype(np.float32)
    g = rng.normal(size=(B, N, F)).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(w), jnp.asarray(g)


def test_scatter_pallas_interpret_matches_jnp():
    """The Pallas weighted row scatter (interpret mode on CPU) must agree
    with the XLA scatter-add to float32 accumulation accuracy."""
    idx, w, g = _rand_inputs()
    V = 700
    ref = weighted_scatter_rows_jnp(idx, w, g, V)
    got = weighted_scatter_rows_pallas(idx, w, g, V, tile_n=128, tile_v=256,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_scatter_pallas_clustered_indices():
    """Candidate-tile compaction path: indices concentrated in few vertex
    tiles (the realistic warp pattern) must still scatter exactly."""
    rng = np.random.default_rng(7)
    B, N, k, V = 1, 256, 4, 1024
    # all indices inside one vertex tile + a few in the last tile
    idx = rng.integers(100, 140, size=(B, N, k)).astype(np.int32)
    idx[0, ::31] = rng.integers(V - 20, V, size=idx[0, ::31].shape)
    w = rng.uniform(size=(B, N, k)).astype(np.float32)
    g = rng.normal(size=(B, N, 16)).astype(np.float32)
    ref = weighted_scatter_rows_jnp(jnp.asarray(idx), jnp.asarray(w),
                                    jnp.asarray(g), V)
    got = weighted_scatter_rows_pallas(jnp.asarray(idx), jnp.asarray(w),
                                       jnp.asarray(g), V, tile_n=128,
                                       tile_v=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _blend_setup(seed=1, B=2, N=200, V=300, k=4, J=12):
    rng = np.random.default_rng(seed)
    table = rng.normal(size=(B, V, J + 16)).astype(np.float32)
    # realistic lbs columns: soft one-hot so the confidence gate fires both
    # ways
    lbs = rng.dirichlet(np.full(J, 0.1), size=(B, V)).astype(np.float32)
    table[..., :J] = lbs
    dists = np.sort(rng.uniform(0.01, 0.5, size=(B, N, k)).astype(np.float32),
                    axis=-1)
    idx = rng.integers(0, V, size=(B, N, k)).astype(np.int32)
    return jnp.asarray(table), jnp.asarray(dists), jnp.asarray(idx), J


def test_gather_blend_value_matches_impl():
    table, dists, idx, J = _blend_setup()
    bd, bf = gather_blend(table, dists, idx, J, 0.1, 0.9)
    bd_ref, bf_ref, _ = _gather_blend_impl(table, dists, idx, J, 0.1, 0.9)
    np.testing.assert_allclose(np.asarray(bd), np.asarray(bd_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bf), np.asarray(bf_ref), atol=1e-6)


def test_gather_blend_gradient_matches_autodiff():
    """The custom VJP must reproduce plain-XLA autodiff of the same math
    (dists stop-gradient'd, as every caller does)."""
    table, dists, idx, J = _blend_setup(seed=2)

    def loss_custom(t):
        bd, bf = gather_blend(t, dists, idx, J, 0.1, 0.9)
        return jnp.sum(jnp.sin(bf) * 1.7) + jnp.sum(bd * 0.0)

    def loss_plain(t):
        bd, bf, _ = _gather_blend_impl(t, jax.lax.stop_gradient(dists), idx,
                                       J, 0.1, 0.9)
        return jnp.sum(jnp.sin(bf) * 1.7) + jnp.sum(bd * 0.0)

    g_custom = jax.grad(loss_custom)(table)
    g_plain = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)


def test_warp_gradient_end_to_end_matches_plain_path():
    """blend_neighbour_transforms with the custom-VJP op must produce the
    same gradients w.r.t. the frame geometry (ober2cano) as a plain jnp
    re-implementation — the property the body-param refinement relies on."""
    from animnerf_tpu.data.synthetic import make_body_model, random_pose_params
    from animnerf_tpu.models.warp import (
        blend_neighbour_transforms,
        prepare_frame,
        transform_points,
        unpose,
    )

    model = make_body_model(num_verts=256, num_joints=12, seed=5)
    params = {k: jnp.asarray(v) for k, v in
              random_pose_params(12, batch=1, seed=5).items()}
    tmpl_np = random_pose_params(12, batch=1, seed=105, scale=0.05)
    tmpl_np["transl"][:] = 0.0
    template = {k: jnp.asarray(v) for k, v in tmpl_np.items()}
    ctx = prepare_frame(model, params, template)
    xyz = ctx.verts[:, ::7] + 0.01

    def loss_via_ctx(ober2cano):
        c = ctx.replace(ober2cano=ober2cano)
        xyz_cano, _, valid = unpose(c, xyz, k=4, dis_threshold=0.2)
        return jnp.sum(xyz_cano**2 * valid)

    def loss_plain(ober2cano):
        # plain-jnp reference: gather + blend with XLA autodiff
        from animnerf_tpu.ops.knn import knn

        B, N = xyz.shape[:2]
        V, J = ctx.lbs_weights.shape
        dists, idx = knn(xyz, ctx.verts, k=4)
        dists = jax.lax.stop_gradient(dists)
        table = jnp.concatenate(
            [jnp.broadcast_to(ctx.lbs_weights, (B, V, J)),
             ober2cano.reshape(B, V, 16)], axis=-1)
        g = jnp.take_along_axis(
            table, idx.reshape(B, N * 4, 1), axis=1).reshape(B, N, 4, J + 16)
        conf = jnp.exp(-jnp.sum(jnp.abs(g[..., :J] - g[..., 0:1, :J]),
                                axis=-1) / (2.0 * 0.1**2))
        gate = (conf > 0.9).astype(xyz.dtype)
        w = jnp.exp(-dists) * gate
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        flat = jnp.einsum("bnk,bnkf->bnf", w, g[..., J:],
                          precision=jax.lax.Precision.HIGHEST)
        T = flat.reshape(B, N, 4, 4)
        dist = jnp.sum(w * dists, axis=-1, keepdims=True)
        valid = (dist < 0.2).astype(xyz.dtype)
        return jnp.sum(transform_points(T, xyz) ** 2 * valid)

    g1 = jax.grad(loss_via_ctx)(ctx.ober2cano)
    g2 = jax.grad(loss_plain)(ctx.ober2cano)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
