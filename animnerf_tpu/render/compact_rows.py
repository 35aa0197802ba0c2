"""Rows-native sample-compacted rendering for the TRAINING step.

The training twin of the inference compaction (render/inference.py) built
on the rows-native kernel pipeline (render_rays_rows): samples stay on the
lane axis from the stratified sampler through the fused kNN/warp-blend/MLP
kernels, and the coarse pass runs only on in-shell survivors.

Why this beats render_rays_compact (the point-major engine, kept for the
split path): that engine runs the kNN DENSE because the exact validity
test *is* a kNN byproduct. But the kNN is the single largest kernel of the
step (~45 ms of ~245 at 16x1024 rays), and the conservative inflated-AABB
pre-pass (ops/knn.py::keep_rows_within_boxes — exact end-to-end, see
below) costs ~1/30 of it, so compacting BEFORE the kNN removes ~half the
kNN, warp-blend and coarse-MLP work in one cut. Measured keep fractions on
the flagship workload (perturbed sampling, max-per-row ~= mean):

    coarse boxes pre-pass   49%   (exact in-shell 38%)
    fine importance samples 99%   -> the fine warp/kNN is never compacted

The fine pass piggybacks on the coarse compaction without any work of its
own: the fine MLP is pointwise, so it runs on the UNSORTED concatenation
[compacted coarse warp rows | dense fine warp rows] (~71% of the dense
merged size), and only the per-ray [r|g|b|sigma|z] composite payload is
depth-sorted afterwards — the same lane shuffle the dense path uses, on 5
channels instead of 8.

All survivor movement is PERMUTATION-VIA-SORT (ops/perm_sort.py): two
earlier engines lost to data movement on this chip — point-major
take_along_axis gathers cost ~21 ms/channel at 1M rows, and even flat 1-D
T(1024) gathers, ~0.03 ms in isolation, measure ~13 ms inside the real
step where the kernels' DMA traffic keeps the 4 MB table out of VMEM and
590k random HBM reads go latency-bound (xprof, round 4). A multi-operand
lax.sort streams memory sequentially and costs the same in- and out-of-
program (~3.7 ms for key + 4 channels), so compact/expand here are sorts
by precomputed rank keys with sort-based inverse-permutation VJPs.

Exactness (tested in tests/test_compact_rows.py): dropped samples are
provably outside the dis_threshold shell, so the warp's own validity test
gives them sigma == SIGMA_OUTSIDE (anim_nerf.py:305) => composite weight
exactly 0 and zero cotangent (relu'(-1e5) == 0). That holds BOTH for
dropped samples that never run (their expand lanes take the fill) and for
the ones at ranks [n_kept, cap) that do flow through the kernels (the
sort has no padded-duplicate lanes — spare capacity processes the first
dropped samples and scatters their outputs to their true positions, where
the kernel's fill value and zero gradient make them indistinguishable
from the dense path). All RNG draws (stratified jitter, importance
samples, sigma noise) are issued in the same order on the same dense
shapes as render_rays_rows.

Reference behaviour being reproduced: models/anim_nerf.py:290-307 (warp +
sigma fill) and models/volume_rendering.py:163-232 (two-pass rendering).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from animnerf_tpu.models.anim_nerf import SIGMA_OUTSIDE
from animnerf_tpu.ops.perm_sort import (
    compact_channels,
    compaction_ranks,
    expand_channels,
)
from animnerf_tpu.render.volume_renderer import (
    RendererConfig,
    _rows_from_z,
    composite_rows,
    sample_coarse,
    sample_fine,
)
from animnerf_tpu.utils import rng as prng


def render_rays_rows_compact(
    cfg: RendererConfig,
    warp_rows_fn: Callable,
    field_rows_fn: Callable,
    rays: jax.Array,
    cap_c: int,
    keep_rows_fn: Callable,
    perturb: float = 0.0,
    key: Optional[jax.Array] = None,
    morton: bool = False,
):
    """render_rays_rows with the coarse pass compacted (and the fine MLP
    shrunk for free by reusing the compacted coarse rows).

    Args:
      warp_rows_fn / field_rows_fn: the rows-native model hooks
        (AnimNeRFModel.warp_rows / field_rows). With morton=True the
        coarse call passes tile_skip=True (forwarded to the kNN kernel),
        so warp_rows_fn must accept that keyword.
      cap_c: survivor capacity of the coarse pass (per batch row).
      keep_rows_fn: rows (B, 8, N) -> (B, N) bool, a CONSERVATIVE
        validity pre-pass (ops/knn.py::keep_rows_within_boxes).
      morton: order the compacted survivors by Morton code instead of
        original ray order, and enable the kNN kernel's vertex-tile skip
        on the coarse sweep (exact either way — the permutation machinery
        inverts any order, every kernel is pointwise per lane; only float
        accumulation order in weight grads can differ).

    Returns (out dict, n_c): the max-per-row survivor count; n_c > cap_c
    means survivors were sigma-filled this call — the trainer detects it
    and re-runs / ratchets (training/system.py::RowsCompactTrainer).
    """
    from animnerf_tpu.ops.sort_lanes import permute_lanes

    if key is None:
        key = jax.random.PRNGKey(0)
    k_coarse, k_fine, k_noise_c, k_noise_f, k_depth = prng.split_keys(key, 5)
    del k_depth  # n_fine_depth unsupported under compaction (trainer gate)

    B, R = rays.shape[:2]
    # compact/expand_channels require cap <= N (the trainer's quantum
    # ladder can overshoot the dense size on small configs); at cap == N
    # the "compaction" is a pure permutation and nothing can overflow
    cap_c = min(cap_c, R * cfg.n_coarse)
    z_coarse = sample_coarse(cfg, rays, perturb, k_coarse)
    Kc = z_coarse.shape[-1]
    rows_c = _rows_from_z(rays, z_coarse)                  # (B, 8, R*Kc)

    keep_c = keep_rows_fn(rows_c)                          # (B, R*Kc)
    o, inv, n_c = compaction_ranks(
        keep_c,
        xyz_rows=tuple(rows_c[:, c] for c in range(3)) if morton else None)

    xyz_sel = compact_channels(
        tuple(rows_c[:, c] for c in range(3)), o, inv, cap_c)
    sel_rows = jnp.concatenate(
        [jnp.stack(xyz_sel, axis=1),
         jnp.zeros((B, 5, cap_c), rows_c.dtype)], axis=1)  # (B, 8, cap_c)

    wout_sel = (warp_rows_fn(sel_rows, tile_skip=True) if morton
                else warp_rows_fn(sel_rows))
    f_sel = field_rows_fn(wout_sel, False)                 # (B, 8, cap_c)

    def expand_cols(src):
        """Expand [r|g|b|sigma] survivor columns to dense (B, R, Kc) with
        the dense path's fills (rgb 0, sigma SIGMA_OUTSIDE — identical to
        what the dense field emits for out-of-shell samples, up to
        weight-0 rgb the composite never reads)."""
        dense = expand_channels(tuple(src[:, c] for c in range(4)),
                                (0.0, 0.0, 0.0, SIGMA_OUTSIDE), o, inv)
        return [c.reshape(B, R, Kc) for c in dense]

    # composite_rows reads channels [0:3] (rgb) and [3] (sigma) only
    frows_c = jnp.stack(expand_cols(f_sel), axis=1)        # (B, 4, R, Kc)

    def run_coarse():
        return composite_rows(cfg, frows_c, rays, z_coarse, perturb,
                              k_noise_c)

    if cfg.n_fine > 0 and cfg.share_fine:
        weights, rgb_c, depth_c, alpha_c = jax.tree.map(
            jax.lax.stop_gradient, run_coarse())
    else:
        weights, rgb_c, depth_c, alpha_c = run_coarse()

    out = {"rgbs": rgb_c, "alphas": alpha_c, "depths": depth_c}
    if cfg.n_fine <= 0:
        return out, n_c

    mids = 0.5 * (z_coarse[..., :-1] + z_coarse[..., 1:])
    z_fine = jax.lax.stop_gradient(
        sample_fine(cfg, mids, weights[..., 1:-1],
                    det=(perturb == 0), key=k_fine))
    Kf = z_fine.shape[-1]
    # fine importance samples concentrate on the body (~99% in-shell
    # measured) — their warp/kNN runs dense (no capacity), but under
    # `morton` they are spatially SORTED first (a pure permutation, cap
    # == N) so the fine kNN/warp-blend see coherent lanes too; their
    # field outputs are un-permuted below before compositing
    rows_f = _rows_from_z(rays, z_fine)                    # (B, 8, R*Kf)
    if morton:
        keep_f = jnp.ones((B, R * Kf), bool)
        o_f, inv_f, _ = compaction_ranks(
            keep_f, xyz_rows=tuple(rows_f[:, c] for c in range(3)))
        xyz_f = compact_channels(
            tuple(rows_f[:, c] for c in range(3)), o_f, inv_f, R * Kf)
        rows_f = jnp.concatenate(
            [jnp.stack(xyz_f, axis=1),
             jnp.zeros((B, 5, R * Kf), rows_f.dtype)], axis=1)
        wout_f = warp_rows_fn(rows_f, tile_skip=True)
    else:
        wout_f = warp_rows_fn(rows_f)

    # ONE fine-MLP call on the unsorted [compacted coarse | dense fine]
    # concat — the MLP is pointwise, so only the composite needs depth
    # order. Survivor outputs expand into the coarse block; the fine
    # block is already dense and just reshapes into place.
    f_m = field_rows_fn(jnp.concatenate([wout_sel, wout_f], axis=2), True)
    f_mc, f_mf = f_m[:, :, :cap_c], f_m[:, :, cap_c:]

    cols_c = expand_cols(f_mc)                             # 4 x (B, R, Kc)
    if morton:
        # undo the fine spatial permutation (fills unused: cap == N)
        cols_f = [c.reshape(B, R, Kf) for c in expand_channels(
            tuple(f_mf[:, c] for c in range(4)),
            (0.0, 0.0, 0.0, SIGMA_OUTSIDE), o_f, inv_f)]
    else:
        cols_f = [f_mf[:, c].reshape(B, R, Kf) for c in range(4)]
    K = Kc + Kf
    z_all = jnp.concatenate([z_coarse, z_fine], axis=-1)
    pay = jnp.stack(
        [jnp.concatenate([c, f], axis=-1) for c, f in zip(cols_c, cols_f)]
        + [z_all], axis=1)                                 # (B, 5, R, K)

    # identical lane merge-sort to render_rays_rows: +inf pad depths sort
    # last, positions [:K] are the real samples in depth order
    padK = 128 - K
    assert padK >= 0, "rows path supports K <= 128 samples/ray"
    z_pad = jnp.pad(z_all, ((0, 0), (0, 0), (0, padK)),
                    constant_values=jnp.inf)
    pay = jnp.pad(pay, ((0, 0), (0, 0), (0, 0), (0, padK)))
    order = jnp.argsort(z_pad, axis=-1).astype(jnp.int32)
    lane_inv = jnp.argsort(order, axis=-1).astype(jnp.int32)
    sp = permute_lanes(pay, order, lane_inv)[:, :, :, :K]  # (B, 5, R, K)
    z_sorted = sp[:, 4]

    _, rgb_f, depth_f, alpha_f = composite_rows(
        cfg, sp, rays, z_sorted, perturb, k_noise_f)

    if cfg.share_fine:
        out = {"rgbs": rgb_f, "alphas": alpha_f, "depths": depth_f}
    else:
        out.update({"rgbs_fine": rgb_f, "alphas_fine": alpha_f,
                    "depths_fine": depth_f})
    return out, n_c
