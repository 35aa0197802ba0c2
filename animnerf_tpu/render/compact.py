"""Sample-level compacted rendering — shared by inference and training.

Most samples of a frame/batch lie outside the `dis_threshold` shell around
the body: their blended kNN distance provably exceeds the threshold (it is
a convex combination of neighbour distances, all >= the nearest-vertex
distance), so downstream they get sigma == SIGMA_OUTSIDE and contribute
exactly zero composite weight (reference anim_nerf.py:305,
volume_rendering.py:141-153). The expensive warp (kNN + LBS blend) and MLP
therefore only need to run on the in-shell survivors:

  keep  = nearest-vertex-distance(sample) < dis_threshold   (cheap pre-pass)
  sel   = first-`cap` survivor indices per batch row (cap from a geometric
          ladder of compiled sizes; padded with the out-of-bounds index N)
  dense = scatter(compute(gather(sel)))  ->  composite as usual

Bit-exactness: non-selected slots receive the same SIGMA_OUTSIDE fill and
rgb = 0 the dense path's validity masking produces; padded `sel` entries
gather clamped (duplicate) inputs but their scatter lanes are DROPPED
(out-of-bounds index), so they write nothing and carry zero gradient; the
composite consumes the same dense grids (incl. the sigma-noise draw, which
is applied on the dense grid with the same key). Gradients: selected
samples' paths are untouched; unselected samples carry zero gradient in
both paths (constant sigma fill, zero weight).

`sel` indexes the row-flattened (R*K) sample grid. The fine merge uses the
same concat-then-stable-argsort order as the dense renderer, so the sorted
composite is permutation-identical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from animnerf_tpu.models.anim_nerf import SIGMA_OUTSIDE
from animnerf_tpu.render.volume_renderer import (
    RendererConfig,
    composite,
    sort_payload,
)


def select_indices(keep: jax.Array, cap: int) -> jax.Array:
    """(B, N) bool -> (B, cap) int32 survivor indices.

    Padded lanes carry the OUT-OF-BOUNDS index N (== keep.shape[1]): the
    scatters below drop them (mode="drop") and the gathers clamp them
    (mode="clip"), so padding neither writes values nor routes gradient.
    (Padding with 0 was a bug: when a row's flat sample 0 was a real
    survivor, the duplicate scatter writes were forward-exact but the
    .at[].set VJP routed the full cotangent to EVERY duplicate, scaling
    sample 0's gradient by ~the pad count.)

    Implemented as an s32 key sort rather than jnp.nonzero(size=cap):
    where(keep, iota, N) sorted ascending lists the survivor indices in
    flat order, then every N-fill — identical output, but XLA's TPU sort
    of s32 keys measured ~10 ms at 6M rows where nonzero's cumsum/
    partition fusions cost ~110 ms/frame at 512^2 (xprof, round 4)."""
    n = keep.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1)
    keys = jnp.where(keep, iota, jnp.int32(n))
    if keep.shape[0] == 1:
        # flat 1-D sort: XLA keeps the linear T(1024) layout (the (1, N)
        # axis-1 sort picks T(1,128) and runs ~8x slower at 8M rows)
        sel = jnp.sort(keys.reshape(-1)).reshape(keys.shape)
    else:
        sel = jnp.sort(keys, axis=1)
    if cap <= n:
        return jax.lax.slice_in_dim(sel, 0, cap, axis=1)
    return jnp.pad(sel, ((0, 0), (0, cap - n)), constant_values=n)


def _flat_scatter_indices(sel: jax.Array, n: int) -> jax.Array:
    """Row-offset sel into the flattened (B*n,) grid; padded lanes
    (sel >= n) map to B*n, out of bounds for EVERY row, so mode="drop"
    discards them instead of corrupting the next row."""
    B = sel.shape[0]
    flat = sel + (jnp.arange(B, dtype=sel.dtype) * n)[:, None]
    return jnp.where(sel >= n, B * n, flat).ravel()


def gather_samples(rays: jax.Array, z_flat: jax.Array, sel: jax.Array,
                   K: int):
    """rays (B, R, 8), z_flat (B, R*K), sel (B, cap) -> per-sample
    xyz (B, cap, 3), viewdir (B, cap, 3)."""
    ray_i = sel // K
    rays_sel = jnp.take_along_axis(rays, ray_i[..., None], axis=1,
                                   mode="clip")
    z_sel = jnp.take_along_axis(z_flat, sel, axis=1, mode="clip")
    xyz = rays_sel[..., 0:3] + z_sel[..., None] * rays_sel[..., 3:6]
    return xyz, rays_sel[..., 3:6]


def _scatter_1d(vals: jax.Array, flat: jax.Array, n: int, fill):
    """1-D scatter of (M,) vals at (M,) flat indices into an (n,)-grid.

    Multi-channel row scatters into tiled (x, 128) layouts read-modify-
    write partial tiles — the (12.6M, 3) rgb scatter of the 512^2 fused
    render measured 483 ms (xprof, round 4). The SAME rows scattered as
    independent 1-D ops into linear T(1024) layouts cost ~30 ms each, so
    every dense fill here is built channel-by-channel."""
    base = jnp.full((n,), fill, vals.dtype) if fill != 0 \
        else jnp.zeros((n,), vals.dtype)
    return base.at[flat].set(vals, mode="drop")


def scatter_dense(rgb: Optional[jax.Array], sigma: jax.Array,
                  sel: jax.Array, R: int, K: int):
    """Scatter compacted (B, cap, ...) rgb/sigma into dense (B, R, K[,3])
    grids with the SIGMA_OUTSIDE / zero fill of the dense validity mask.
    rgb=None skips the rgb grid (sigma-only fill for weight-only
    composites); returns (rgb_d | None, sigma_d)."""
    B = sel.shape[0]
    flat = _flat_scatter_indices(sel, R * K)
    sigma_d = _scatter_1d(sigma.reshape(-1), flat, B * R * K,
                          SIGMA_OUTSIDE).reshape(B, R, K)
    if rgb is None:
        return None, sigma_d
    rgb_d = jnp.stack(
        [_scatter_1d(rgb[..., c].reshape(-1), flat, B * R * K, 0)
         for c in range(3)], axis=-1).reshape(B, R, K, 3)
    return rgb_d, sigma_d


def compact_coarse(cfg: RendererConfig, warp_fn, field_fn, rays: jax.Array,
                   z_c: jax.Array, sel_c: jax.Array, perturb: float,
                   k_noise: Optional[jax.Array], need_rgb: bool = True):
    """Coarse pass on compacted samples; dense composite.

    Returns (out dict, weights (B, R, Kc), warped_sel) where warped_sel is
    the compacted (cano, viewdir, valid) for reuse in the fine pass (the
    dense renderer's warp-dedup, volume_renderer.py:192-199).

    need_rgb=False skips the rgb fill and composite sum — when a fine pass
    follows, the coarse composite exists only to feed `weights` into the
    importance sampler, and the coarse image is discarded (reference
    novel_view.py:100-104 reads the *_fine keys); out is then None."""
    from animnerf_tpu.render.volume_renderer import composite_weights

    B, R, Kc = z_c.shape
    xyz, vd = gather_samples(rays, z_c.reshape(B, -1), sel_c, Kc)
    cano, vd2, valid = warp_fn(xyz, vd)
    if vd2 is None:
        vd2 = vd
    rgb, sigma = field_fn(cano, vd2, valid, False)
    if not need_rgb:
        _, sigma_d = scatter_dense(None, sigma[..., 0], sel_c, R, Kc)
        weights, _ = composite_weights(cfg, sigma_d, rays, z_c, perturb,
                                       k_noise)
        return None, weights, (cano, vd2, valid)
    rgb_d, sigma_d = scatter_dense(rgb, sigma[..., 0], sel_c, R, Kc)
    weights, rgb_c, depth_c, alpha_c = composite(
        cfg, rgb_d, sigma_d, rays, z_c, perturb, k_noise)
    out = {"rgbs": rgb_c, "alphas": alpha_c, "depths": depth_c}
    return out, weights, (cano, vd2, valid)


def compact_fine(cfg: RendererConfig, warp_fn, field_fn, rays: jax.Array,
                 z_c: jax.Array, z_f: jax.Array, sel_c: jax.Array,
                 warped_c, sel_f: jax.Array, perturb: float,
                 k_noise: Optional[jax.Array]):
    """Fine pass: warp only the compacted fine samples, one fine-field
    evaluation over (compacted coarse + compacted fine), dense merge-sort
    composite in the dense renderer's concat order."""
    B, R, Kc = z_c.shape
    Kf = z_f.shape[-1]
    Kall = Kc + Kf

    xyz_f, vd_f = gather_samples(rays, z_f.reshape(B, -1), sel_f, Kf)
    cano_f, vd_f2, valid_f = warp_fn(xyz_f, vd_f)
    if vd_f2 is None:
        vd_f2 = vd_f

    cano_c, vd_c, valid_c = warped_c
    cano = jnp.concatenate([cano_c, cano_f], axis=1)
    vd = jnp.concatenate([vd_c, vd_f2], axis=1)
    valid = (None if valid_c is None
             else jnp.concatenate([valid_c, valid_f], axis=1))
    rgb, sigma = field_fn(cano, vd, valid, True)

    # dense concat layout (R, Kc + Kf), coarse slots first — matches the
    # dense renderer's concat order before its stable argsort
    idx_c = (sel_c // Kc) * Kall + (sel_c % Kc)
    idx_f = (sel_f // Kf) * Kall + Kc + (sel_f % Kf)
    sel_all = jnp.concatenate([idx_c, idx_f], axis=1)
    z_all = jnp.concatenate([z_c, z_f], axis=-1)

    if Kall <= 128:
        # lane-shuffle merge: the channel-leading [r|g|b|sigma|z] payload
        # rides the 1-D channel scatters straight into the per-ray lane
        # permutation (ops/sort_lanes.py) — the point-major (B, R, Kall, 5)
        # sort gather this replaces measured 176 ms/frame at 512^2. Depth
        # pads at +inf sort LAST and stable argsort keeps the concat order
        # on ties, so rows [:Kall] are exactly sort_payload's permutation.
        from animnerf_tpu.ops.sort_lanes import permute_lanes
        from animnerf_tpu.render.volume_renderer import composite_rows

        flat = _flat_scatter_indices(sel_all, R * Kall)
        n = sel_all.shape[0] * R * Kall
        rows = [_scatter_1d(rgb[..., c].reshape(-1), flat, n, 0)
                for c in range(3)]
        rows.append(_scatter_1d(sigma[..., 0].reshape(-1), flat, n,
                                SIGMA_OUTSIDE))
        B = sel_all.shape[0]
        pay = jnp.stack([r.reshape(B, R, Kall) for r in rows]
                        + [z_all.astype(rows[0].dtype)], axis=1)
        padK = 128 - Kall
        z_pad = jnp.pad(z_all, ((0, 0), (0, 0), (0, padK)),
                        constant_values=jnp.inf)
        pay = jnp.pad(pay, ((0, 0), (0, 0), (0, 0), (0, padK)))
        order = jnp.argsort(z_pad, axis=-1).astype(jnp.int32)
        inv = jnp.argsort(order, axis=-1).astype(jnp.int32)
        sp = permute_lanes(pay.astype(jnp.float32), order, inv)[..., :Kall]
        sp = sp.astype(pay.dtype)
        z_sorted = sp[:, 4]
        _, rgb_f, depth_f, alpha_f = composite_rows(
            cfg, sp, rays, z_sorted, perturb, k_noise)
        return {"rgbs": rgb_f, "alphas": alpha_f, "depths": depth_f}

    rgb_d, sigma_d = scatter_dense(rgb, sigma[..., 0], sel_all, R, Kall)
    z_sorted, (sigma_s, rgb_s) = sort_payload(
        z_all, [sigma_d[..., None], rgb_d])
    _, rgb_f, depth_f, alpha_f = composite(
        cfg, rgb_s, sigma_s[..., 0], rays, z_sorted, perturb, k_noise)
    return {"rgbs": rgb_f, "alphas": alpha_f, "depths": depth_f}


def scatter_warped(warped_c, sel_c: jax.Array, R: int, K: int):
    """Scatter compacted warp outputs (cano, viewdir, valid) into dense
    (B, R, K, C) grids with a zero fill. Non-selected slots get valid == 0
    — exactly the state the dense path's warp leaves them in (invalid,
    sigma filled downstream), so a dense fine pass over these grids is
    value-identical to the dense renderer's warp-dedup reuse."""
    cano, vd, valid = warped_c
    B, cap = sel_c.shape
    flat = _flat_scatter_indices(sel_c, R * K)

    def scat(t, C):
        # per-channel 1-D scatters (see _scatter_1d for why)
        return jnp.stack(
            [_scatter_1d(t.reshape(-1, C)[:, c], flat, B * R * K, 0)
             for c in range(C)], axis=-1).reshape(B, R, K, C)

    cano_d = scat(cano, 3)
    vd_d = scat(vd, 3)
    valid_d = None if valid is None else scat(valid, 1)
    return cano_d, vd_d, valid_d


def render_rays_compact(cfg: RendererConfig, warp_fn, field_fn,
                        rays: jax.Array, cap_c: int, knn_fn, blend_fn,
                        keep_thr: float, perturb: float = 0.0,
                        key: Optional[jax.Array] = None):
    """Compacted equivalent of render_rays_split for the training step.

    The kNN runs DENSE — it sits at the VPU's brute-force compute floor
    (~9 ops x N x V, PERF.md), and a separate min-distance pre-pass costs
    nearly as much as the kNN itself, so pre-filtering cannot make the kNN
    cheaper. Its nearest-neighbour distance IS the exact validity test for
    free: blended distance is a convex combination of neighbour distances,
    so dists[..., 0] >= keep_thr proves the sample invalid
    (anim_nerf.py:305). Everything BEHIND the kNN — the LBS gather/blend
    (with its scatter-backward), transform, and coarse MLP — runs only on
    the `cap_c` in-shell survivors and scatters back into the dense grid.

    The fine pass runs DENSE over the scattered coarse warp grids —
    importance sampling already concentrates the fine depths on the body
    (measured 98.8% in-shell: a fine capacity rung would PAD PAST the
    dense size; inference, whose deterministic fine depths spread wider,
    compacts both passes via compact_coarse/compact_fine directly).

    knn_fn(xyz (B, N, 3)) -> (dists (B, N, k), idx); blend_fn(xyz, vd,
    dists, idx) -> (cano, vd', valid) — the split warp halves
    (models/warp.py::unpose_with_knn). Returns (out, count) where count is
    the max per-row survivor total (the CompactTrainer's capacity
    feedback; count > cap_c means survivors were dropped this step).

    Gradient-exactness: sel indices are integers (no tangent); z_coarse
    gradients into the body params via the root-frame near/far tightening
    (models/warp.py:148-150) are preserved; fine depths are stop-gradient
    in the dense path too (volume_renderer.py:238-240). PRNG key splitting
    mirrors render_rays_split exactly."""
    from animnerf_tpu.render.volume_renderer import (
        _eval_field,
        _ray_points,
        _warp,
        sample_coarse,
        sample_fine,
    )

    if key is None:
        key = jax.random.PRNGKey(0)
    from animnerf_tpu.utils import rng as prng

    k_coarse, k_fine, k_noise_c, k_noise_f, k_depth = prng.split_keys(key, 5)
    del k_depth  # n_fine_depth unsupported under compaction

    z_coarse = sample_coarse(cfg, rays, perturb, k_coarse)
    B, R, Kc = z_coarse.shape
    xyz, vd = _ray_points(rays, z_coarse)          # (B, R*Kc, 3)
    dists, idx = knn_fn(xyz)
    keep = dists[..., 0] < keep_thr
    count = jnp.max(jnp.sum(keep, axis=1)).astype(jnp.int32)
    sel_c = select_indices(keep, cap_c)

    g = lambda t: jnp.take_along_axis(
        t, sel_c[..., None] if t.ndim == 3 else sel_c, axis=1, mode="clip")
    cano, vd2, valid = blend_fn(g(xyz), g(vd), g(dists), g(idx))
    if vd2 is None:
        vd2 = g(vd)
    rgb, sigma = field_fn(cano, vd2, valid, False)
    rgb_d, sigma_d = scatter_dense(rgb, sigma[..., 0], sel_c, R, Kc)
    weights, rgb_c, depth_c, alpha_c = composite(
        cfg, rgb_d, sigma_d, rays, z_coarse, perturb, k_noise_c)
    out_c = {"rgbs": rgb_c, "alphas": alpha_c, "depths": depth_c}
    warped_c = (cano, vd2, valid)

    if cfg.n_fine <= 0:
        return out_c, count
    # share_fine: the dense path stop-grads the coarse composite
    # (volume_renderer.py:222-229) — here the coarse outputs feed only the
    # (already stop-gradient) fine depths, so no stop_gradient is needed.

    mids = 0.5 * (z_coarse[..., :-1] + z_coarse[..., 1:])
    z_f = sample_fine(cfg, mids, weights[..., 1:-1],
                      det=(perturb == 0), key=k_fine)
    z_f = jax.lax.stop_gradient(z_f)

    cano_d, vd_d, valid_d = scatter_warped(warped_c, sel_c, R, Kc)
    cano_f, vd_f, valid_f = _warp(warp_fn, rays, z_f)

    z_all = jnp.concatenate([z_coarse, z_f], axis=-1)

    def cat(a, b):
        return None if a is None or b is None \
            else jnp.concatenate([a, b], axis=2)

    # one packed permutation gather (see volume_renderer.sort_payload)
    z_sorted, (cano_s, vd_s, valid_s) = sort_payload(
        z_all, [cat(cano_d, cano_f), cat(vd_d, vd_f),
                cat(valid_d, valid_f)])
    rgbs, sigmas = _eval_field(field_fn, cano_s, vd_s, valid_s,
                               use_fine=True)
    _, rgb_f, depth_f, alpha_f = composite(
        cfg, rgbs, sigmas, rays, z_sorted, perturb, k_noise_f)
    out_f = {"rgbs": rgb_f, "alphas": alpha_f, "depths": depth_f}

    if cfg.share_fine:
        return out_f, count
    out = dict(out_c)
    out.update({k + "_fine": v for k, v in out_f.items()})
    return out, count
