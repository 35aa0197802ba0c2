"""Fused warp-blend kernel (ops/warp_blend.py) vs the XLA reference path.

The XLA reference is gather_blend + transform_points — the exact pipeline
unpose_with_knn runs today (reference anim_nerf.py:161-192). The kernel
must match forward values and the custom-VJP gradients (d_xyz through the
blended rotation, d_table through the weighted scatter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animnerf_tpu.ops.blend import gather_blend
from animnerf_tpu.ops.warp_blend import warp_blend, warp_blend_fwd_pallas

K, J, F = 4, 24, 40


def _rig(B=2, N=700, V=333, seed=0, coherent=True):
    """Random verts + ray-coherent query points + their true kNN."""
    rng = np.random.default_rng(seed)
    verts = rng.normal(scale=0.4, size=(B, V, 3)).astype(np.float32)
    if coherent:
        # samples along rays: consecutive points share neighbourhoods,
        # exercising the candidate-chunk pruning the kernel relies on
        o = rng.normal(scale=1.0, size=(B, N // 70 + 1, 1, 3))
        d = rng.normal(size=o.shape)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t = np.linspace(-1.2, 1.2, 70).reshape(1, 1, 70, 1)
        pts = (o + t * d).reshape(B, -1, 3)[:, :N].astype(np.float32)
    else:
        pts = rng.normal(scale=0.8, size=(B, N, 3)).astype(np.float32)

    d2 = np.sum((pts[:, :, None] - verts[:, None]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=-1)[..., :K].astype(np.int32)
    dists = np.sqrt(np.take_along_axis(d2, idx, axis=-1)).astype(np.float32)

    # table: lbs weights with repeated rows (so the conf gate passes and
    # fails across pairs) + random affine transforms
    lbs = rng.dirichlet(np.ones(J) * 0.2, size=V // 7 + 1).astype(np.float32)
    lbs = np.repeat(lbs, 7, axis=0)[:V]
    T = rng.normal(scale=0.3, size=(B, V, 16)).astype(np.float32)
    table = np.concatenate(
        [np.broadcast_to(lbs, (B, V, J)), T], axis=-1).astype(np.float32)
    return (jnp.asarray(pts), jnp.asarray(dists), jnp.asarray(idx),
            jnp.asarray(table))


def _xla_reference(xyz, viewdir, dists, idx, table, warp_view):
    bd, bf = gather_blend(table, dists, idx, J, 0.1, 0.9)
    T = bf.reshape(*idx.shape[:2], 4, 4)
    cano = jnp.einsum("bnij,bnj->bni", T[..., :3, :3], xyz) + T[..., :3, 3]
    vd = viewdir
    if warp_view and viewdir is not None:
        vd = (jnp.einsum("bnij,bnj->bni", T[..., :3, :3], viewdir)
              + T[..., :3, 3])
    return cano, vd, bd


@pytest.mark.parametrize("coherent", [True, False])
def test_forward_matches_xla(coherent):
    xyz, dists, idx, table = _rig(coherent=coherent)
    out, w, bf = warp_blend_fwd_pallas(
        xyz, None, dists, idx, table, J, 0.1, 0.9, warp_view=False,
        tile_n=256, interpret=True)
    N = xyz.shape[1]
    cano = out[:, 0:3, :N].transpose(0, 2, 1)
    bd = out[:, 3:4, :N].transpose(0, 2, 1)

    cano_ref, _, bd_ref = _xla_reference(xyz, None, dists, idx, table, False)
    np.testing.assert_allclose(np.asarray(bd), np.asarray(bd_ref),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cano), np.asarray(cano_ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_viewdir_warp():
    xyz, dists, idx, table = _rig(seed=3)
    rng = np.random.default_rng(5)
    vd = rng.normal(size=xyz.shape).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    vd = jnp.asarray(vd)

    out, _, _ = warp_blend_fwd_pallas(
        xyz, vd, dists, idx, table, J, 0.1, 0.9, warp_view=True,
        tile_n=256, interpret=True)
    N = xyz.shape[1]
    vd_out = out[:, 4:7, :N].transpose(0, 2, 1)
    _, vd_ref, _ = _xla_reference(xyz, vd, dists, idx, table, True)
    np.testing.assert_allclose(np.asarray(vd_out), np.asarray(vd_ref),
                               atol=1e-5, rtol=1e-5)


def test_vertex_chunk_boundaries():
    """Indices straddling the 128-vertex chunk boundary (and the padded
    final chunk) must gather the right rows."""
    B, N, V = 1, 256, 130  # 2 chunks, second nearly empty
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    idx = np.stack([
        np.full(N, 126), np.full(N, 127), np.full(N, 128), np.full(N, 129)],
        axis=-1).astype(np.int32)[None]
    dists = np.abs(rng.normal(size=(B, N, K))).astype(np.float32)
    lbs = np.broadcast_to(rng.dirichlet(np.ones(J)).astype(np.float32),
                          (V, J))  # identical weights: gate always passes
    T = rng.normal(size=(B, V, 16)).astype(np.float32)
    table = jnp.asarray(np.concatenate(
        [np.broadcast_to(lbs, (B, V, J)), T], axis=-1).astype(np.float32))
    idx, dists = jnp.asarray(idx), jnp.asarray(dists)

    out, _, _ = warp_blend_fwd_pallas(
        xyz, None, dists, idx, table, J, 0.1, 0.9, tile_n=256,
        interpret=True)
    cano = out[:, 0:3, :N].transpose(0, 2, 1)
    cano_ref, _, _ = _xla_reference(xyz, None, dists, idx, table, False)
    np.testing.assert_allclose(np.asarray(cano), np.asarray(cano_ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla():
    """d_xyz and d_table of the custom VJP vs autodiff through the XLA
    reference path (whose gather_blend custom VJP is itself validated in
    test_blend.py)."""
    xyz, dists, idx, table = _rig(B=1, N=256, V=200, seed=11)
    tgt = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 256, 3)).astype(np.float32))

    def loss_fused(xyz, table):
        cano, _, bd = warp_blend(xyz, None, dists, idx, table, J, 0.1, 0.9,
                                 False)
        return jnp.sum((cano - tgt) ** 2)

    def loss_xla(xyz, table):
        cano, _, bd = _xla_reference(xyz, None, dists, idx, table, False)
        return jnp.sum((cano - tgt) ** 2)

    # interpret mode for the kernel on CPU
    import animnerf_tpu.ops.warp_blend as WB
    orig = WB.warp_blend_fwd_pallas
    WB_kw = dict(tile_n=256, interpret=True)

    def patched(*a, **k):
        k.update(WB_kw)
        return orig(*a, **k)

    WB.warp_blend_fwd_pallas = patched
    try:
        l1, (gx1, gt1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(
            xyz, table)
    finally:
        WB.warp_blend_fwd_pallas = orig
    l2, (gx2, gt2) = jax.value_and_grad(loss_xla, argnums=(0, 1))(xyz, table)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2),
                               atol=1e-4, rtol=1e-4)


def test_morton_permuted_path_matches_xla():
    """The full fused dispatch as unpose() runs it on TPU: Morton-sort
    verts, kNN in permuted space, permuted table through the kernel — must
    equal the XLA path in ORIGINAL space (permutation invariance of the
    blend; ties are measure-zero on random data)."""
    from animnerf_tpu.ops.warp_blend import morton_codes, permute_rows

    xyz, dists, idx, table = _rig(B=2, N=512, V=300, seed=21)
    rng = np.random.default_rng(2)
    verts = jnp.asarray(rng.normal(scale=0.4, size=(2, 300, 3)).astype(np.float32))

    perm = jnp.argsort(morton_codes(verts), axis=1)
    inv = jnp.argsort(perm, axis=1)
    verts_p = jnp.take_along_axis(verts, perm[..., None], axis=1)
    table_p = permute_rows(table, perm, inv)

    # exact kNN in both spaces
    def knn_np(pts, vs):
        d2 = np.sum((np.asarray(pts)[:, :, None] - np.asarray(vs)[:, None]) ** 2,
                    axis=-1)
        ii = np.argsort(d2, axis=-1)[..., :K].astype(np.int32)
        return (np.sqrt(np.take_along_axis(d2, ii, axis=-1)).astype(np.float32),
                ii)

    d_o, i_o = knn_np(xyz, verts)
    d_p, i_p = knn_np(xyz, verts_p)
    np.testing.assert_allclose(d_o, d_p, atol=1e-6)  # perm-invariant dists

    out, _, _ = warp_blend_fwd_pallas(
        xyz, None, jnp.asarray(d_p), jnp.asarray(i_p), table_p, J, 0.1, 0.9,
        tile_n=256, interpret=True)
    N = xyz.shape[1]
    cano = out[:, 0:3, :N].transpose(0, 2, 1)

    cano_ref, _, _ = _xla_reference(xyz, None, jnp.asarray(d_o),
                                    jnp.asarray(i_o), table, False)
    np.testing.assert_allclose(np.asarray(cano), np.asarray(cano_ref),
                               atol=1e-4, rtol=1e-4)


def test_permute_rows_grad_is_inverse_gather():
    rng = np.random.default_rng(0)
    from animnerf_tpu.ops.warp_blend import permute_rows

    x = jnp.asarray(rng.normal(size=(2, 64, 5)).astype(np.float32))
    perm = jnp.asarray(np.stack([rng.permutation(64) for _ in range(2)]))
    inv = jnp.argsort(perm, axis=1)
    tgt = jnp.asarray(rng.normal(size=(2, 64, 5)).astype(np.float32))

    g1 = jax.grad(lambda x: jnp.sum((permute_rows(x, perm, inv) - tgt) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(
        (jnp.take_along_axis(x, perm[..., None], axis=1) - tgt) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_transposed_inputs_match_point_major():
    """inputs_t=True ((B,k,N) kNN-native dists/idx) must equal the
    point-major path, forward and gradients (incl. the transposed
    scatter-backward plumbing)."""
    xyz, dists, idx, table = _rig(B=1, N=256, V=200, seed=13)
    d_t = dists.transpose(0, 2, 1)
    i_t = idx.transpose(0, 2, 1)
    tgt = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 256, 3)).astype(np.float32))

    import animnerf_tpu.ops.warp_blend as WB
    orig = WB.warp_blend_fwd_pallas

    def patched(*a, **kw):
        kw.update(tile_n=256, interpret=True)
        return orig(*a, **kw)

    WB.warp_blend_fwd_pallas = patched
    try:
        def loss_pm(xyz, table):
            cano, _, _ = warp_blend(xyz, None, dists, idx, table,
                                    J, 0.1, 0.9, False, False)
            return jnp.sum((cano - tgt) ** 2)

        def loss_t(xyz, table):
            cano, _, _ = warp_blend(xyz, None, d_t, i_t, table,
                                    J, 0.1, 0.9, False, True)
            return jnp.sum((cano - tgt) ** 2)

        l1, (gx1, gt1) = jax.value_and_grad(loss_pm, argnums=(0, 1))(xyz, table)
        l2, (gx2, gt2) = jax.value_and_grad(loss_t, argnums=(0, 1))(xyz, table)
    finally:
        WB.warp_blend_fwd_pallas = orig

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), atol=1e-6)


@pytest.mark.parametrize("k,J_", [(2, 24), (8, 24), (4, 5), (4, 16)])
def test_generic_k_and_lbs_dims(k, J_):
    """k != 4 (k_neigh is configurable) and non-SMPL LBS dims (FLAME J=5
    pads the table feature axis to 24; MANO J=16 gives F=32)."""
    rng = np.random.default_rng(k * 100 + J_)
    B, N, V = 1, 256, 260
    verts = rng.normal(scale=0.4, size=(B, V, 3)).astype(np.float32)
    pts = rng.normal(scale=0.5, size=(B, N, 3)).astype(np.float32)
    d2 = np.sum((pts[:, :, None] - verts[:, None]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=-1)[..., :k].astype(np.int32)
    dists = np.sqrt(np.take_along_axis(d2, idx, axis=-1)).astype(np.float32)
    lbs = rng.dirichlet(np.ones(J_), size=V // 5 + 1).astype(np.float32)
    lbs = np.repeat(lbs, 5, axis=0)[:V]
    T = rng.normal(scale=0.3, size=(B, V, 16)).astype(np.float32)
    table = np.concatenate([np.broadcast_to(lbs, (B, V, J_)), T],
                           axis=-1).astype(np.float32)
    pts, dists, idx, table = map(jnp.asarray, (pts, dists, idx, table))

    out, w, bf = warp_blend_fwd_pallas(
        pts, None, dists, idx, table, J_, 0.1, 0.9, tile_n=256,
        interpret=True)
    cano = out[:, 0:3, :N].transpose(0, 2, 1)

    bd_ref, bf_ref = gather_blend(table, dists, idx, J_, 0.1, 0.9)
    Tm = bf_ref.reshape(B, N, 4, 4)
    cano_ref = (jnp.einsum("bnij,bnj->bni", Tm[..., :3, :3], pts)
                + Tm[..., :3, 3])
    np.testing.assert_allclose(np.asarray(cano), np.asarray(cano_ref),
                               atol=1e-5, rtol=1e-5)


def test_rows_entry_matches_point_major():
    """warp_blend_rows (the transposed pipeline's entry) must equal the
    point-major op in values and gradients."""
    from animnerf_tpu.ops.warp_blend import warp_blend_rows

    xyz, dists, idx, table = _rig(B=1, N=256, V=200, seed=17)
    B, N = 1, 256
    xyz_t = jnp.pad(xyz.transpose(0, 2, 1), ((0, 0), (0, 5), (0, 0)))
    d_t, i_t = dists.transpose(0, 2, 1), idx.transpose(0, 2, 1)
    tgt = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, 3, N)).astype(np.float32))

    import animnerf_tpu.ops.warp_blend as WB
    orig = WB.warp_blend_fwd_pallas

    def patched(*a, **kw):
        kw.update(tile_n=256, interpret=True)
        return orig(*a, **kw)

    WB.warp_blend_fwd_pallas = patched
    try:
        def loss_rows(xyz_t, table):
            out = warp_blend_rows(xyz_t, d_t, i_t, table, J, 0.1, 0.9)
            return jnp.sum((out[:, 0:3] - tgt) ** 2), out

        def loss_pm(xyz, table):
            cano, _, bd = warp_blend(xyz, None, dists, idx, table,
                                     J, 0.1, 0.9, False, False)
            return (jnp.sum((cano.transpose(0, 2, 1) - tgt) ** 2),
                    (cano, bd))

        (l1, out_r), (gx1, gt1) = jax.value_and_grad(
            loss_rows, argnums=(0, 1), has_aux=True)(xyz_t, table)
        (l2, (cano, bd)), (gx2, gt2) = jax.value_and_grad(
            loss_pm, argnums=(0, 1), has_aux=True)(xyz, table)
    finally:
        WB.warp_blend_fwd_pallas = orig

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_r[:, 0:3]),
                               np.asarray(cano.transpose(0, 2, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_r[:, 3:4]),
                               np.asarray(bd.transpose(0, 2, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx1[:, 0:3]),
                               np.asarray(gx2.transpose(0, 2, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), atol=1e-5)
