"""Observation->canonical warping (the heart of Anim-NeRF).

Pure-functional re-design of the reference's stateful warp pipeline
(/root/reference/models/anim_nerf.py:108-192). All per-frame geometry is
computed once into an explicit ``FrameContext`` pytree:

  set_body_model (:108-126)            -> prepare_frame
  convert_to_body_model_space (:128-145)-> rebase_to_root (rays + geometry)
  clac_ober2cano_transform (:147-151)  -> ober2cano transform
  get_neighbs + unpose (:153-192)      -> unpose(ctx, xyz)

Numerical notes kept deliberately bit-faithful:
  * near/far tightened to cam_dist -/+ 1.0 (:134-136)
  * the blendshape deltas are injected into the *translation column* of the
    inverted vertex transform before left-multiplying the template
    transform (:148-151)
  * neighbour weights are exp(-dist), gated by a hard (>0.9) LBS-weight
    similarity confidence with std 0.1 (:165-171)
  * the reference's misspelled `self.joints_transfrom` assignment (:143)
    makes the joint-transform rebase a no-op; we simply don't rebase it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from animnerf_tpu.ops.blend import gather_blend
from animnerf_tpu.ops.knn import knn
from animnerf_tpu.smpl.body_model import BodyModel, BodyModelOutput, forward as body_forward


def affine_inverse(T: jax.Array) -> jax.Array:
    """Closed-form inverse of (..., 4, 4) affine transforms.

    LBS-blended vertex transforms are affine but not rigid, so we invert the
    3x3 block by adjugate/determinant (VPU-friendly; no LU like
    torch.inverse needs).
    """
    M = T[..., :3, :3]
    t = T[..., :3, 3]
    # adjugate of M
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    Minv = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    ) * inv_det[..., None, None]
    tinv = -jnp.einsum("...mn,...n->...m", Minv, t,
                       precision=jax.lax.Precision.HIGHEST)
    top = jnp.concatenate([Minv, tinv[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jax.Array, p: jax.Array, directional: bool = False) -> jax.Array:
    """Apply (..., 4, 4) affine transforms to (..., 3) points/directions."""
    out = jnp.einsum("...mn,...n->...m", T[..., :3, :3], p,
                     precision=jax.lax.Precision.HIGHEST)
    if not directional:
        out = out + T[..., :3, 3]
    return out


# --- flat-16 affine helpers -------------------------------------------------
# Per-vertex 4x4 transforms as SIXTEEN (B, V) channel arrays instead of
# (B, V, 4, 4) tensors: the tiny trailing (4, 4) dims land in (4, 128)/(8,
# 128) tiles at 3-12% lane utilisation, so every matmul/inverse on that
# shape moves ~8-32x its logical bytes (measured ~27 ms/train-step of
# "convolution fusion" HLOs on the V=6890, B=16 flagship). Channel form
# keeps (B, V) arrays (V on lanes, fully dense) and lets XLA fuse the whole
# compose -> inverse -> compose chain of prepare_frame elementwise.


def _t16_of(T4: jax.Array) -> list:
    """(..., 4, 4) -> 16 channel arrays (...) via the flat view (one padded
    read of the 4x4 layout; cancels entirely when the producer was flat)."""
    flat = T4.reshape(*T4.shape[:-2], 16)
    return [flat[..., c] for c in range(16)]


def _compose16(a: list, b: list) -> list:
    """c = a @ b on 16-channel affine transforms (rows 3 == [0,0,0,1])."""
    c: list = [None] * 16
    for i in range(3):
        for j in range(4):
            s = (a[4 * i + 0] * b[j] + a[4 * i + 1] * b[4 + j]
                 + a[4 * i + 2] * b[8 + j])
            if j == 3:
                s = s + a[4 * i + 3]
            c[4 * i + j] = s
    zero = jnp.zeros_like(c[0])
    c[12] = c[13] = c[14] = zero
    c[15] = jnp.ones_like(c[0])
    return c


def _inverse16(t: list) -> list:
    """affine_inverse on 16-channel transforms (adjugate/determinant — LBS
    blends are affine, not rigid)."""
    a, b, c0, tx = t[0], t[1], t[2], t[3]
    d, e, f, ty = t[4], t[5], t[6], t[7]
    g, h, i, tz = t[8], t[9], t[10], t[11]
    A = e * i - f * h
    B = c0 * h - b * i
    C = b * f - c0 * e
    D = f * g - d * i
    E = a * i - c0 * g
    F = c0 * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    s = 1.0 / (a * A + b * D + c0 * G)
    A, B, C, D, E, F, G, H, I = (A * s, B * s, C * s, D * s, E * s, F * s,
                                 G * s, H * s, I * s)
    zero = jnp.zeros_like(a)
    return [A, B, C, -(A * tx + B * ty + C * tz),
            D, E, F, -(D * tx + E * ty + F * tz),
            G, H, I, -(G * tx + H * ty + I * tz),
            zero, zero, zero, jnp.ones_like(a)]


@struct.dataclass
class FrameContext:
    """Everything the renderer needs about one (batch of) observed frame(s),
    already rebased into the SMPL root frame.

    The two `*_morton` fields are a per-frame cache for the fused warp
    (filled by prepare_frame iff the fused warp kernel is enabled): the
    Morton-sorted vertex cloud and the permuted [lbs | ober2cano] table.
    unpose runs 2-3x per step (coarse / fine / fine-depth samples) on the
    same ctx; caching makes the argsorts and the table permute (and the
    permute's inverse-gather VJP, via cotangent accumulation) run once.
    Invariant: the cache must match verts/ober2cano/lbs_weights. Mutate
    geometry through with_geometry() — it drops the cache by construction;
    a bare `.replace(verts=...)` would silently warp with stale geometry."""

    verts: jax.Array            # (B, V, 3) observed verts, root frame
    joints: jax.Array           # (B, J, 3) observed joints, root frame
    ober2cano: jax.Array        # (B, V, 16) per-vertex obs->canonical,
    #                             row-major flat 4x4 (see _t16_of)
    root_inv: jax.Array         # (B, 4, 4) world->root transform
    verts_template: jax.Array   # (B, V, 3) canonical-space template verts
    lbs_weights: jax.Array      # (V, J)
    verts_morton: Optional[jax.Array] = None  # (B, V, 3) Morton-sorted
    table_morton: Optional[jax.Array] = None  # (B, V, J+16) permuted table

    def with_geometry(self, **updates) -> "FrameContext":
        """replace() for geometry fields that also invalidates the fused-warp
        Morton cache. Use this instead of bare .replace() when changing
        verts / ober2cano / lbs_weights (pose refinement, jitter ablations)."""
        return self.replace(verts_morton=None, table_morton=None, **updates)


def _forward_obs_template(model: BodyModel, params: dict,
                          params_template: dict):
    """Run the body model for observed AND template params in ONE batched
    forward (2B) instead of two B-sized calls.

    The FK/LBS chain is per-batch-element independent (no batch
    reductions), so slicing the 2B outputs is bit-identical to two separate
    calls — but one call halves the kernel launches of the step's
    latency-bound small-op stretch (rodrigues, pointer-doubling FK,
    blendshape matmuls run once at 2B instead of twice at B). Falls back to
    two calls when the dicts aren't shape-compatible (e.g. Layer-variant
    rotation-matrix poses on one side only)."""
    keys = set(params)
    batchable = keys == set(params_template) and all(
        hasattr(params[k], "shape") and hasattr(params_template[k], "shape")
        and params[k].shape == params_template[k].shape
        and params[k].ndim >= 1
        for k in keys
    )
    if not batchable:
        return body_forward(model, **params), body_forward(
            model, **params_template)
    B = next(iter(params.values())).shape[0]
    stacked = {k: jnp.concatenate([params[k], params_template[k]], axis=0)
               for k in keys}
    both: BodyModelOutput = body_forward(model, **stacked)
    obs = jax.tree.map(lambda a: a[:B], both)
    tmpl = jax.tree.map(lambda a: a[B:], both)
    return obs, tmpl


def prepare_frame(
    model: BodyModel,
    params: dict,
    params_template: dict,
    num_lbs_joints: Optional[int] = None,
) -> FrameContext:
    """Run the body model for observed+template params and derive the warp.

    Equivalent of set_body_model + the geometry half of
    convert_to_body_model_space + clac_ober2cano_transform.
    """
    J = num_lbs_joints or model.num_joints

    obs, tmpl = _forward_obs_template(model, params, params_template)

    root = obs.joints_transform[:, 0]          # (B, 4, 4) pelvis transform
    root_inv = affine_inverse(root)

    verts = transform_points(root_inv[:, None], obs.vertices)
    joints = transform_points(root_inv[:, None], obs.joints[:, :J])

    # obs->canonical: template vertex transform composed with the inverse of
    # the (root-frame) observed vertex transform, blendshape deltas folded
    # into the translation column (reference anim_nerf.py:147-151). The
    # whole compose -> inverse -> compose chain runs in 16-channel form —
    # (B, V, 4, 4) intermediates lane-pad 8-32x (see _t16_of).
    vt16 = _compose16(_t16_of(root_inv[:, None]),
                      _t16_of(obs.vertices_transform))
    inv16 = _inverse16(vt16)
    delta = (tmpl.shape_offsets - obs.shape_offsets) + (
        tmpl.pose_offsets - obs.pose_offsets
    )
    inv16[3] = inv16[3] + delta[..., 0]
    inv16[7] = inv16[7] + delta[..., 1]
    inv16[11] = inv16[11] + delta[..., 2]
    o2c16 = _compose16(_t16_of(tmpl.vertices_transform), inv16)
    ober2cano = jnp.stack(o2c16, axis=-1)      # (B, V, 16)

    ctx = FrameContext(
        verts=verts,
        joints=joints,
        ober2cano=ober2cano,
        root_inv=root_inv,
        verts_template=tmpl.vertices,
        lbs_weights=model.lbs_weights,
    )
    if _fused_warp_enabled():
        verts_p, table_p = _morton_inputs(ctx)
        ctx = ctx.replace(verts_morton=verts_p, table_morton=table_p)
    return ctx


def _morton_inputs(ctx: FrameContext) -> tuple[jax.Array, jax.Array]:
    """(Morton-sorted verts, permuted [lbs | ober2cano] table) for the
    fused warp kernel — from the ctx cache when prepare_frame filled it,
    else built inline (ctx constructed while the fused warp was disabled,
    e.g. CPU tests driving the kernels in interpret mode).

    Morton-sorting the vertices makes index neighbourhoods spatial
    neighbourhoods, so the blend kernel's candidate-chunk pruning (and the
    scatter backward's candidate tiles) see a handful of chunks per point
    tile regardless of the mesh's native vertex order. kNN is exact under
    permutation (distance order preserved; only measure-zero ties can pick
    a different equal-distance vertex)."""
    if ctx.verts_morton is not None:
        return ctx.verts_morton, ctx.table_morton

    from animnerf_tpu.ops.warp_blend import morton_codes, permute_rows

    B = ctx.verts.shape[0]
    V, J = ctx.lbs_weights.shape
    verts_c = jax.lax.stop_gradient(ctx.verts)
    perm = jnp.argsort(morton_codes(verts_c), axis=1)
    inv = jnp.argsort(perm, axis=1)
    verts_p = jnp.take_along_axis(verts_c, perm[..., None], axis=1)
    table = jnp.concatenate(
        [jnp.broadcast_to(ctx.lbs_weights, (B, V, J)),
         ctx.ober2cano], axis=-1)
    return verts_p, permute_rows(table, perm, inv)


def rays_to_root_frame(ctx: FrameContext, rays: jax.Array) -> jax.Array:
    """Rebase (B, R, 8) rays into the root frame, tightening near/far to the
    +/-1m shell around the body (reference anim_nerf.py:128-137)."""
    Tinv = ctx.root_inv[:, None]
    o = transform_points(Tinv, rays[..., 0:3])
    d = transform_points(Tinv, rays[..., 3:6], directional=True)
    cam_dist = jnp.linalg.norm(o, axis=-1, keepdims=True)
    near = jnp.maximum(rays[..., 6:7], cam_dist - 1.0)
    far = jnp.minimum(rays[..., 7:8], cam_dist + 1.0)
    return jnp.concatenate([o, d, near, far], axis=-1)


def _fused_warp_enabled() -> bool:
    """Fused warp-blend kernel on TPU (ANIMNERF_WARP_FUSED=0 opts out)."""
    import os

    if os.environ.get("ANIMNERF_WARP_FUSED", "1") != "1":
        return False
    from animnerf_tpu.utils.platform import on_tpu

    return on_tpu()


def blend_neighbour_transforms(
    ctx: FrameContext,
    xyz: jax.Array,
    k: int = 4,
    weight_std: float = 0.1,
    conf_gate: float = 0.9,
    far_skip: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """kNN against the observed verts; confidence-gated exp(-d) blending of
    the per-vertex obs->canonical transforms (reference anim_nerf.py:153-178).

    Returns:
      blended_dist: (B, N, 1)
      blended_transform: (B, N, 4, 4)
    """
    B, N = xyz.shape[:2]
    V, J = ctx.lbs_weights.shape

    dists, idx = knn(xyz, ctx.verts, k=k, far_skip=far_skip)
    dists = jax.lax.stop_gradient(dists)

    # ONE fused gather of [lbs weights | flat transform] per neighbour and
    # an einsum blend over the flat (16) transform — never materialising a
    # (B, N, k, 4, 4) tensor whose tiny trailing dims would lane-pad 32x on
    # TPU. gather_blend is a custom-VJP op: the backward is a Pallas
    # scatter-free segment-sum on the MXU instead of XLA's scatter-add
    # (the single largest train-step cost before — see ops/blend.py).
    table = jnp.concatenate(
        [jnp.broadcast_to(ctx.lbs_weights, (B, V, J)),
         ctx.ober2cano], axis=-1)  # (B, V, J+16)
    blended_dist, blended_flat = gather_blend(
        table, dists, idx, J, float(weight_std), float(conf_gate))
    blended_T = blended_flat.reshape(B, N, 4, 4)
    return blended_dist, blended_T


def unpose(
    ctx: FrameContext,
    xyz: jax.Array,
    viewdir: Optional[jax.Array] = None,
    k: int = 4,
    dis_threshold: float = 0.2,
    weight_std: float = 0.1,
    unpose_view: bool = False,
    far_skip: bool = False,
) -> tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Warp observed-space points into canonical space.

    Returns (xyz_canonical, viewdir, valid) with valid in {0.,1.}
    (reference anim_nerf.py:180-192).

    far_skip (experimental, default off — flows from
    AnimNeRFConfig.knn_far_skip): skip all-far point tiles in the kNN
    kernel — pipeline-exact because such points are masked to sigma=-1e5
    downstream. Measured neutral on v5e (see PERF.md).
    """
    fs = dis_threshold if far_skip else 0.0

    if _fused_warp_enabled():
        import os

        from animnerf_tpu.ops.knn_pallas import knn_pallas
        from animnerf_tpu.ops.warp_blend import warp_blend

        _, J = ctx.lbs_weights.shape
        verts_p, table_p = _morton_inputs(ctx)
        # kernel-native (B, k, N) flows straight into the blend kernel —
        # no (B, N, k) retiling round trip
        dists, idx = knn_pallas(
            xyz, verts_p, k=k,
            tile_n=int(os.environ.get("ANIMNERF_KNN_TILE_N", "1024")),
            tile_v=int(os.environ.get("ANIMNERF_KNN_TILE_V", "512")),
            far_skip=fs,
            packed=os.environ.get("ANIMNERF_KNN_PACKED", "1") == "1",
            transposed_out=True)

        xyz_cano, viewdir, blended_dist = warp_blend(
            xyz, viewdir, dists, idx, table_p, J, float(weight_std), 0.9,
            bool(unpose_view), True)
        valid = (blended_dist < dis_threshold).astype(xyz.dtype)
        return xyz_cano, viewdir, valid

    dists, idx = knn(xyz, ctx.verts, k=k, far_skip=fs)
    return unpose_with_knn(ctx, xyz, viewdir, dists, idx,
                           dis_threshold=dis_threshold,
                           weight_std=weight_std, unpose_view=unpose_view)


def unpose_with_knn(
    ctx: FrameContext,
    xyz: jax.Array,
    viewdir: Optional[jax.Array],
    dists: jax.Array,
    idx: jax.Array,
    dis_threshold: float = 0.2,
    weight_std: float = 0.1,
    unpose_view: bool = False,
    conf_gate: float = 0.9,
) -> tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """The post-kNN half of unpose: confidence-gated LBS blend + transform
    + validity. Split out so callers that already hold (dists, idx) — the
    compacted training step runs the kNN dense (its nearest distance IS
    the exact validity test) and blends only the in-shell survivors — can
    skip the kNN re-run. Gathering (dists, idx) rows commutes with the
    per-point blend, so results equal unpose() per point exactly."""
    B, N = xyz.shape[:2]
    V, J = ctx.lbs_weights.shape
    dists = jax.lax.stop_gradient(dists)

    table = jnp.concatenate(
        [jnp.broadcast_to(ctx.lbs_weights, (B, V, J)),
         ctx.ober2cano], axis=-1)  # (B, V, J+16)

    if _fused_warp_enabled():
        # one Pallas program: VMEM-resident table, candidate-chunk-pruned
        # lane-shuffle gather, gate + blend + 4x4 apply in registers
        # (replaces ~67 ms/step of XLA gather + loop fusions; see
        # ops/warp_blend.py)
        from animnerf_tpu.ops.warp_blend import warp_blend

        xyz_cano, viewdir, blended_dist = warp_blend(
            xyz, viewdir, dists, idx, table, J, float(weight_std),
            float(conf_gate), bool(unpose_view))
        valid = (blended_dist < dis_threshold).astype(xyz.dtype)
        return xyz_cano, viewdir, valid

    blended_dist, blended_flat = gather_blend(
        table, dists, idx, J, float(weight_std), float(conf_gate))
    T = blended_flat.reshape(B, N, 4, 4)

    valid = (blended_dist < dis_threshold).astype(xyz.dtype)
    xyz_cano = transform_points(T, xyz)
    if unpose_view and viewdir is not None:
        # NB: the reference warps the view direction with pad_ones=True,
        # i.e. *including* the translation (anim_nerf.py:190's
        # batch_transform default) — replicated deliberately.
        viewdir = transform_points(T, viewdir, directional=False)
    return xyz_cano, viewdir, valid


def unpose_rows(
    ctx: FrameContext,
    xyz_t: jax.Array,
    k: int = 4,
    weight_std: float = 0.1,
    far_skip: float = 0.0,
    tile_skip: bool = False,
) -> jax.Array:
    """Rows-native unpose for the transposed pipeline: xyz_t (B, 8, N)
    rows [x|y|z|0..] -> (B, 8, N) rows [x'|y'|z'|blended_dist|0..].
    Same math as unpose() minus viewdir warping (callers are gated to
    unpose_view=False); validity is derived downstream from the
    blended-dist row (< dis_threshold).

    tile_skip: output-identical kNN vertex-tile skipping — pays only when
    the lanes are spatially coherent (the Morton-compacted training step
    sets it; see ops/knn_pallas.py)."""
    import os

    from animnerf_tpu.ops.knn_pallas import knn_pallas
    from animnerf_tpu.ops.warp_blend import warp_blend_rows

    _, J = ctx.lbs_weights.shape
    verts_p, table_p = _morton_inputs(ctx)
    dists, idx = knn_pallas(
        xyz_t[:, 0:3], verts_p, k=k,
        tile_n=int(os.environ.get("ANIMNERF_KNN_TILE_N", "1024")),
        tile_v=int(os.environ.get("ANIMNERF_KNN_TILE_V", "512")),
        far_skip=far_skip,
        packed=os.environ.get("ANIMNERF_KNN_PACKED", "1") == "1",
        transposed_out=True, points_t_in=True, tile_skip=tile_skip)

    return warp_blend_rows(xyz_t, dists, idx, table_p, J,
                           float(weight_std), 0.9)
