"""Volume rendering: stratified + importance sampling and alpha compositing.

Functional re-design of /root/reference/models/volume_rendering.py:7-232.
Semantics replicated exactly (needed for checkpoint-level parity):

  * coarse z-steps are linspace(0, 1 - 1/K, K) — NOT inclusive of 1
    (:39-41); `lindisp=True` means linear in *depth* (the reference's
    naming is inverted vs its comment, :43-46)
  * stratified jitter scales with `perturb` (:48-54)
  * fine samples invert the CDF of the *interior* coarse weights
    (weights[..., 1:-1]) over coarse mid-bins, det when perturb == 0,
    merged with the coarse z and sorted (:195-207, :59-97)
  * compositing adds N(0,1)*noise_std to sigma when perturb > 0 (:128-129);
    alpha = 1 - exp(-delta * relu(sigma)); exclusive cumprod transmittance
    via a shifted-ones concat; last delta = 1e10; white background adds
    (1 - sum w) to rgb and (1 - sum w) * far to depth (:131-153)

Randomness is explicit: every sampling fn takes a PRNG key.

TPU notes: there is no chunk loop — callers render the whole (possibly
sharded) ray batch in one fused program; the per-ray tensors here are
(B, R, K) shaped and XLA fuses the compositing chain into the MLP epilogue.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from animnerf_tpu.utils import rng as prng


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    n_coarse: int = 64
    n_fine: int = 32
    n_fine_depth: int = 0
    share_fine: bool = False
    noise_std: float = 1.0
    depth_std: float = 0.02
    white_bkgd: bool = True
    lindisp: bool = True  # True => linear in depth (reference quirk)


def sample_coarse(cfg: RendererConfig, rays: jax.Array, perturb: float,
                  key: Optional[jax.Array]) -> jax.Array:
    """Stratified coarse depths. rays: (B, R, 8) -> (B, R, Kc)."""
    near, far = rays[..., 6:7], rays[..., 7:8]
    K = cfg.n_coarse
    z_steps = jnp.linspace(0.0, 1.0 - 1.0 / K, K, dtype=rays.dtype)
    z_steps = jnp.broadcast_to(z_steps, rays.shape[:-1] + (K,))

    if cfg.lindisp:  # linear in depth (see module docstring)
        z = near * (1.0 - z_steps) + far * z_steps
    else:  # linear in disparity
        z = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)

    if perturb > 0 and key is not None:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        u = perturb * prng.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * u
    return z


def sample_fine(cfg: RendererConfig, bins: jax.Array, weights: jax.Array,
                det: bool, key: Optional[jax.Array],
                eps: float = 1e-5) -> jax.Array:
    """Importance sampling by CDF inversion.

    bins: (B, R, Kc-1) coarse mid depths; weights: (B, R, Kc-2) interior
    coarse weights. Returns (B, R, Kf).

    Contract: the returned depths are STOP-GRADIENT on every platform (the
    reference detaches its fine z the same way — weights are .detach()ed
    and z_vals feed a no-grad sort, volume_rendering.py:195-207). The TPU
    branch's gather_lanes is inherently non-differentiable, so the return
    is stop_gradient'd unconditionally to keep platform semantics equal.
    """
    Kf = cfg.n_fine
    w = jax.lax.stop_gradient(weights) + eps
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (B,R,Kc-1)

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, Kf, dtype=bins.dtype)
        u = jnp.broadcast_to(u, bins.shape[:-1] + (Kf,))
    else:
        u = prng.uniform(key, bins.shape[:-1] + (Kf,), dtype=bins.dtype)

    # batched "searchsorted right": count cdf entries <= u. The cdf is only
    # Kc-1 wide, so the dense (..., Kf, Kc-1) comparison is a trivial VPU op
    # (vmapped binary-search searchsorted measured ~30x slower on TPU).
    inds = jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cfg.n_coarse - 2)

    # pack [cdf | bins] so each bound needs ONE gather, not two — these
    # 1-D gathers are latency-bound (~constant cost per op, not per byte)
    nbins = cdf.shape[-1]
    from animnerf_tpu.ops.sort_lanes import LANES, gather_lanes
    from animnerf_tpu.utils.platform import on_tpu

    if on_tpu() and nbins <= LANES and Kf <= LANES:
        # per-ray LANE gathers (tpu.dynamic_gather) instead of two
        # point-major (B*R*Kf, 2) strided gathers (28 ms each at 4.2M
        # rows, 512^2 xprof). gather_lanes is stop-gradient — matching
        # every caller, which stop-gradients the fine depths anyway
        # (the reference's fine z is detached too: its weights are
        # .detach()ed and z_vals feed a no-grad sort, volume_rendering.py
        # :195-207)
        pay = jnp.stack([cdf, bins], axis=1)            # (B, 2, R, nbins)
        lo = gather_lanes(pay, below.astype(jnp.int32))
        hi = gather_lanes(pay, above.astype(jnp.int32))
        cdf_lo, bin_lo = lo[:, 0], lo[:, 1]
        cdf_hi, bin_hi = hi[:, 0], hi[:, 1]
        u = jax.lax.stop_gradient(u)
    else:
        cb = jnp.stack([cdf, bins], axis=-1)  # (B, R, Kc-1, 2)
        lo = jnp.take_along_axis(cb, below[..., None], axis=-2)
        hi = jnp.take_along_axis(cb, above[..., None], axis=-2)
        cdf_lo, bin_lo = lo[..., 0], lo[..., 1]
        cdf_hi, bin_hi = hi[..., 0], hi[..., 1]

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_lo) / denom
    return jax.lax.stop_gradient(bin_lo + t * (bin_hi - bin_lo))


def sample_fine_depth(cfg: RendererConfig, rays: jax.Array, depth: jax.Array,
                      key: jax.Array) -> jax.Array:
    """Gaussian samples around a given depth, clamped to [near, far]
    (reference :99-111)."""
    z = jnp.repeat(depth, cfg.n_fine_depth, axis=-1)
    z = z + prng.normal(key, z.shape, dtype=z.dtype) * cfg.depth_std
    near, far = rays[..., 6:7], rays[..., 7:8]
    return jnp.clip(z, near, far)


def composite_weights(cfg: RendererConfig, sigmas: jax.Array,
                      rays: jax.Array, z_samp: jax.Array, perturb: float,
                      key: Optional[jax.Array], far_inf: bool = True):
    """Transmittance weights of DEPTH-SORTED samples. sigmas/z (B,R,K) ->
    (weights (B,R,K), weights_sum (B,R,1))."""
    if cfg.noise_std > 0 and perturb > 0 and key is not None:
        sigmas = sigmas + prng.normal(key, sigmas.shape,
                                      dtype=sigmas.dtype) * cfg.noise_std

    deltas = z_samp[..., 1:] - z_samp[..., :-1]
    if far_inf:
        delta_last = jnp.full_like(deltas[..., :1], 1e10)
    else:
        delta_last = rays[..., 7:8] - z_samp[..., -1:]
    deltas = jnp.concatenate([deltas, delta_last], axis=-1)

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1)
    transmittance = jnp.cumprod(shifted, axis=-1)[..., :-1]
    weights = alphas * transmittance
    return weights, jnp.sum(weights, axis=-1, keepdims=True)


def composite(cfg: RendererConfig, rgbs: jax.Array, sigmas: jax.Array,
              rays: jax.Array, z_samp: jax.Array, perturb: float,
              key: Optional[jax.Array], far_inf: bool = True):
    """Alpha compositing. rgbs (B,R,K,3), sigmas (B,R,K) -> dict of images.

    Returns (weights (B,R,K), rgb (B,R,3), depth (B,R,1), alpha_sum (B,R,1)).
    """
    weights, weights_sum = composite_weights(cfg, sigmas, rays, z_samp,
                                             perturb, key, far_inf)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * z_samp, axis=-1, keepdims=True)

    if cfg.white_bkgd:
        depth = depth + (1.0 - weights_sum) * rays[..., 7:8]
        rgb = rgb + (1.0 - weights_sum)

    return weights, rgb, depth, weights_sum


@partial(jax.custom_vjp, nondiff_argnums=())
def permute_samples(vals: jax.Array, order: jax.Array, inv: jax.Array):
    """take_along_axis along the sample axis (2) by a PERMUTATION.

    XLA's VJP for a gather is a scatter-add — measured 63 ms/step for the
    (1.5M, 3) merge-sort gather of the fine pass (scatters run ~1 GB/s on
    TPU). A permutation's adjoint is just the inverse gather, so this
    custom-VJP op replaces that scatter with a second take_along_axis.
    vals (B,R,K) or (B,R,K,C); order/inv (B,R,K) with inv = argsort(order).
    """
    o = order[..., None] if vals.ndim == 4 else order
    return jnp.take_along_axis(vals, o, axis=2)


def _permute_fwd(vals, order, inv):
    return permute_samples(vals, order, inv), (order, inv)


def _permute_bwd(res, g):
    order, inv = res
    i = inv[..., None] if g.ndim == 4 else inv
    return jnp.take_along_axis(g, i, axis=2), None, None


permute_samples.defvjp(_permute_fwd, _permute_bwd)


def sort_payload(z_all: jax.Array, parts: "list[jax.Array | None]"):
    """Depth-sort a merged sample set's per-sample payloads with ONE
    packed permutation gather.

    Profiling showed each 1.5M-row take_along_axis costs ~15-20 ms on TPU
    near-INDEPENDENT of channel count (latency-bound, not bytes), and
    XLA's scatter-add VJP of such a gather another ~63 ms. So: pack
    [z | payloads] into one (B, R, K, C) tensor, gather once through
    permute_samples (whose VJP is the inverse gather — a permutation's
    adjoint), and slice the sorted pieces back out.

    Returns (z_sorted (B,R,K), [sorted parts...]) with None passed through.
    """
    order = jnp.argsort(z_all, axis=-1)
    inv = jnp.argsort(order, axis=-1)
    cols = [z_all[..., None]]
    spans = []
    for p in parts:
        if p is None:
            spans.append(None)
            continue
        start = sum(c.shape[-1] for c in cols)
        cols.append(p)
        spans.append((start, start + p.shape[-1]))
    packed = permute_samples(jnp.concatenate(cols, axis=-1), order, inv)
    outs = [None if s is None else packed[..., s[0]:s[1]] for s in spans]
    return packed[..., 0], outs


WarpFn = Callable[..., tuple]
# warp_fn(xyz (B, N, 3), viewdir (B, N, 3))
#   -> (xyz_cano (B, N, 3), viewdir' (B, N, 3) | None, valid (B, N, 1) | None)
FieldFn = Callable[..., tuple[jax.Array, jax.Array]]
# field_fn(xyz_cano, viewdir, valid, use_fine) -> (rgb (B,N,3), sigma (B,N,1))

# Back-compat single-callback contract (mesh extraction, simple callers):
PointFn = Callable[..., tuple[jax.Array, jax.Array]]


def _ray_points(rays: jax.Array, z_samp: jax.Array):
    B, R, K = z_samp.shape
    xyz = rays[..., None, 0:3] + z_samp[..., None] * rays[..., None, 3:6]
    viewdir = jnp.broadcast_to(rays[..., None, 3:6], (B, R, K, 3))
    return xyz.reshape(B, R * K, 3), viewdir.reshape(B, R * K, 3)


def _warp(warp_fn, rays, z_samp):
    """Warp the sample points of (B, R, K) depths; returns per-sample
    (B, R, K, C) tensors (xyz_cano, viewdir, valid)."""
    B, R, K = z_samp.shape
    xyz, viewdir = _ray_points(rays, z_samp)
    cano, vd, valid = warp_fn(xyz, viewdir)
    reshape = lambda t: None if t is None else t.reshape(B, R, K, -1)
    return reshape(cano), reshape(vd if vd is not None else viewdir), \
        reshape(valid)


def _eval_field(field_fn, cano, viewdir, valid, use_fine: bool):
    B, R, K = cano.shape[:3]
    flat = lambda t: None if t is None else t.reshape(B, R * K, -1)
    rgb, sigma = field_fn(flat(cano), flat(viewdir), flat(valid), use_fine)
    return rgb.reshape(B, R, K, 3), sigma.reshape(B, R, K)


def render_rays_split(cfg: RendererConfig, warp_fn: WarpFn, field_fn: FieldFn,
                      rays: jax.Array, perturb: float = 0.0,
                      key: Optional[jax.Array] = None) -> dict[str, jax.Array]:
    """Full coarse(+fine) rendering of a ray batch (reference :163-232).

    TPU optimisation vs the reference: the observation->canonical warp (kNN +
    LBS blend — the bandwidth hot spot) runs ONCE per unique sample. The
    reference re-warps all Kc coarse samples inside the fine pass
    (volume_rendering.py:195-217 re-runs the full model on the merged,
    sorted depths); here the fine pass warps only the Kf importance samples
    and the merged set is re-ordered by gathering the cached per-sample
    tensors with the sort permutation. The math is identical — the warp
    depends only on xyz.

    Args:
      warp_fn / field_fn: see WarpFn / FieldFn — closures over params + ctx.
      rays: (B, R, 8).
      perturb: stratified-jitter / noise scale (0 for eval).
      key: PRNG key (required when perturb > 0).
    Returns:
      {'rgbs','alphas','depths'} (+ '_fine' variants when the fine field is
      separate; when share_fine the fine results replace the coarse ones).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_coarse, k_fine, k_noise_c, k_noise_f, k_depth = prng.split_keys(key, 5)

    z_coarse = sample_coarse(cfg, rays, perturb, k_coarse)
    cano_c, vd_c, valid_c = _warp(warp_fn, rays, z_coarse)

    def run_coarse():
        rgbs, sigmas = _eval_field(field_fn, cano_c, vd_c, valid_c,
                                   use_fine=False)
        return composite(cfg, rgbs, sigmas, rays, z_coarse, perturb, k_noise_c)

    if cfg.n_fine > 0 and cfg.share_fine:
        # reference runs the whole coarse pass under no_grad when shared
        # (:167-177); the cached warp still carries gradient into the fine
        # pass, exactly like the reference's in-grad fine re-computation
        weights, rgb_c, depth_c, alpha_c = jax.tree.map(
            jax.lax.stop_gradient, run_coarse())
    else:
        weights, rgb_c, depth_c, alpha_c = run_coarse()

    out = {"rgbs": rgb_c, "alphas": alpha_c, "depths": depth_c}

    if cfg.n_fine > 0 or cfg.n_fine_depth > 0:
        z_parts = [z_coarse]
        warped_parts = [(cano_c, vd_c, valid_c)]
        if cfg.n_fine > 0:
            mids = 0.5 * (z_coarse[..., :-1] + z_coarse[..., 1:])
            z_fine = jax.lax.stop_gradient(
                sample_fine(cfg, mids, weights[..., 1:-1],
                            det=(perturb == 0), key=k_fine))
            z_parts.append(z_fine)
            warped_parts.append(_warp(warp_fn, rays, z_fine))
        if cfg.n_fine_depth > 0:
            z_fd = jax.lax.stop_gradient(
                sample_fine_depth(cfg, rays, depth_c, k_depth))
            z_parts.append(z_fd)
            warped_parts.append(_warp(warp_fn, rays, z_fd))

        z_all = jnp.concatenate(z_parts, axis=-1)

        def cat(parts):
            return None if parts[0] is None else jnp.concatenate(parts,
                                                                 axis=2)

        # one packed permutation gather sorts every per-sample payload at
        # once (see sort_payload) — the per-tensor merge gathers and their
        # scatter-add VJPs measured ~125 ms of the train step
        z_sorted, (cano_f, vd_f, valid_f) = sort_payload(
            z_all, [cat([p[0] for p in warped_parts]),
                    cat([p[1] for p in warped_parts]),
                    cat([p[2] for p in warped_parts])])

        rgbs, sigmas = _eval_field(field_fn, cano_f, vd_f, valid_f,
                                   use_fine=True)
        _, rgb_f, depth_f, alpha_f = composite(
            cfg, rgbs, sigmas, rays, z_sorted, perturb, k_noise_f)

        if cfg.share_fine:
            out = {"rgbs": rgb_f, "alphas": alpha_f, "depths": depth_f}
        else:
            out.update({"rgbs_fine": rgb_f, "alphas_fine": alpha_f,
                        "depths_fine": depth_f})
    return out


def render_rays(cfg: RendererConfig, point_fn: PointFn, rays: jax.Array,
                perturb: float = 0.0,
                key: Optional[jax.Array] = None) -> dict[str, jax.Array]:
    """Back-compat wrapper: single observed-space point_fn (identity warp)."""

    def warp_fn(xyz, viewdir):
        return xyz, viewdir, None

    def field_fn(xyz, viewdir, valid, use_fine):
        return point_fn(xyz, viewdir, use_fine)

    return render_rays_split(cfg, warp_fn, field_fn, rays, perturb, key)


# ---------------------------------------------------------------------------
# rows-native (transposed) pipeline — samples ride the LANE axis end to end
# ---------------------------------------------------------------------------


def _rows_from_z(rays: jax.Array, z: jax.Array) -> jax.Array:
    """(B, R, 8) rays x (B, R, K) depths -> (B, 8, R*K) rows [x|y|z|0..]:
    the input form the fused warp/MLP kernels consume, built without ever
    materialising point-major (B, R, K, 3)."""
    B, R, K = z.shape
    rows = [(rays[..., c:c + 1] + z * rays[..., 3 + c:4 + c]
             ).reshape(B, 1, R * K) for c in range(3)]
    rows.append(jnp.zeros((B, 5, R * K), z.dtype))
    return jnp.concatenate(rows, axis=1)


def composite_rows(cfg: RendererConfig, frows: jax.Array, rays: jax.Array,
                   z_samp: jax.Array, perturb: float,
                   key: Optional[jax.Array], far_inf: bool = True):
    """composite() for channel-leading fields: frows (B, 8, R, K) rows
    [r|g|b|sigma|..] -> (weights (B,R,K), rgb (B,R,3), depth, alpha_sum).
    Reuses composite_weights verbatim (identical RNG draw)."""
    sigmas = frows[:, 3]
    weights, weights_sum = composite_weights(cfg, sigmas, rays, z_samp,
                                             perturb, key, far_inf)
    rgb = jnp.sum(weights[:, None] * frows[:, 0:3], axis=-1)  # (B, 3, R)
    rgb = rgb.transpose(0, 2, 1)
    depth = jnp.sum(weights * z_samp, axis=-1, keepdims=True)
    if cfg.white_bkgd:
        depth = depth + (1.0 - weights_sum) * rays[..., 7:8]
        rgb = rgb + (1.0 - weights_sum)
    return weights, rgb, depth, weights_sum


def render_rays_rows(cfg: RendererConfig, warp_rows_fn, field_rows_fn,
                     rays: jax.Array, perturb: float = 0.0,
                     key: Optional[jax.Array] = None) -> dict[str, jax.Array]:
    """render_rays_split with samples on the LANE axis end to end.

    The warp kernel emits (B, 8, N) rows [x'|y'|z'|bd|..]; those rows ARE
    the fine pass's sort payload (plus the depth, stashed in spare row 4),
    so the merge sort becomes a native per-ray lane shuffle
    (ops/sort_lanes.py) instead of two latency-bound (1.5M, 8) permutation
    gathers, and the sorted canonical points flow straight into the fused
    MLP with no point-major era anywhere. Per-step RNG draws are issued in
    the same order/shapes as render_rays_split, so both paths sample
    identical randomness."""
    from animnerf_tpu.ops.sort_lanes import permute_lanes

    if key is None:
        key = jax.random.PRNGKey(0)
    k_coarse, k_fine, k_noise_c, k_noise_f, k_depth = prng.split_keys(key, 5)

    B, R = rays.shape[:2]
    z_coarse = sample_coarse(cfg, rays, perturb, k_coarse)
    Kc = z_coarse.shape[-1]
    wout_c = warp_rows_fn(_rows_from_z(rays, z_coarse))        # (B,8,R*Kc)

    def run_coarse():
        f = field_rows_fn(wout_c, False).reshape(B, 8, R, Kc)
        return composite_rows(cfg, f, rays, z_coarse, perturb, k_noise_c)

    if cfg.n_fine > 0 and cfg.share_fine:
        weights, rgb_c, depth_c, alpha_c = jax.tree.map(
            jax.lax.stop_gradient, run_coarse())
    else:
        weights, rgb_c, depth_c, alpha_c = run_coarse()

    out = {"rgbs": rgb_c, "alphas": alpha_c, "depths": depth_c}

    if cfg.n_fine > 0 or cfg.n_fine_depth > 0:
        z_parts = [z_coarse]
        pay_parts = [wout_c.reshape(B, 8, R, Kc)]
        if cfg.n_fine > 0:
            mids = 0.5 * (z_coarse[..., :-1] + z_coarse[..., 1:])
            z_fine = jax.lax.stop_gradient(
                sample_fine(cfg, mids, weights[..., 1:-1],
                            det=(perturb == 0), key=k_fine))
            z_parts.append(z_fine)
            pay_parts.append(
                warp_rows_fn(_rows_from_z(rays, z_fine))
                .reshape(B, 8, R, z_fine.shape[-1]))
        if cfg.n_fine_depth > 0:
            z_fd = jax.lax.stop_gradient(
                sample_fine_depth(cfg, rays, depth_c, k_depth))
            z_parts.append(z_fd)
            pay_parts.append(
                warp_rows_fn(_rows_from_z(rays, z_fd))
                .reshape(B, 8, R, z_fd.shape[-1]))

        z_all = jnp.concatenate(z_parts, axis=-1)              # (B, R, K)
        K = z_all.shape[-1]
        pay = jnp.concatenate(pay_parts, axis=3)               # (B,8,R,K)
        # depth rides spare payload row 4 so it sorts with everything else
        pay = jnp.concatenate(
            [pay[:, 0:4], z_all[:, None], pay[:, 5:]], axis=1)

        # pad K to the shuffle's 128 lanes; +inf pad depths sort LAST, so
        # positions [:K] of the shuffled payload are exactly the real
        # samples in depth order and the pads never reach the MLP
        padK = 128 - K
        assert padK >= 0, "rows path supports K <= 128 samples/ray"
        z_pad = jnp.pad(z_all, ((0, 0), (0, 0), (0, padK)),
                        constant_values=jnp.inf)
        pay = jnp.pad(pay, ((0, 0), (0, 0), (0, 0), (0, padK)))
        order = jnp.argsort(z_pad, axis=-1).astype(jnp.int32)
        inv = jnp.argsort(order, axis=-1).astype(jnp.int32)
        sorted_pay = permute_lanes(pay, order, inv)[:, :, :, :K]

        z_sorted = sorted_pay[:, 4]                            # (B, R, K)
        f = field_rows_fn(sorted_pay.reshape(B, 8, R * K), True)
        _, rgb_f, depth_f, alpha_f = composite_rows(
            cfg, f.reshape(B, 8, R, K), rays, z_sorted, perturb, k_noise_f)

        if cfg.share_fine:
            out = {"rgbs": rgb_f, "alphas": alpha_f, "depths": depth_f}
        else:
            out.update({"rgbs_fine": rgb_f, "alphas_fine": alpha_f,
                        "depths_fine": depth_f})
    return out
