"""Fused neighbour gather + LBS-transform blend with a scatter-free backward.

The warp's hot composite (reference /root/reference/models/anim_nerf.py:
153-178) gathers, per sample point, its k nearest vertices' rows of a
per-frame table ``[lbs_weights (J) | flat ober2cano transform (16)]`` and
blends the transforms with confidence-gated exp(-dist) weights. Forward,
the gather is one fused ``take_along_axis`` (fast). Backward, XLA
differentiates the gather into a scatter-add of (B, N, k, 16) cotangents
into the (B, V, 16) table — measured ~170 ms/step on a v5e, the single
largest step cost (PERF.md).

The blend weights are *not* differentiable by construction: the kNN
distances are produced under stop-gradient (the reference runs kNN under
``no_grad``, anim_nerf.py:157-159) and the LBS-similarity confidence gate is
a hard threshold (:165-171) whose derivative is zero. The only gradient
path through the gather is the 16 transform columns, weighted by the
(constant) blend weights:

    d_table[b, v, J:] = sum over (n, k) with idx[b,n,k] == v of
                        w[b,n,k] * d_blended[b,n,:]

This module exposes that composite as a ``jax.custom_vjp`` op whose
backward is ``weighted_scatter_rows`` — on TPU a Pallas kernel that keeps
the (V, 16) accumulator VMEM-resident across a sequential point-tile grid
(race-free on TPU) and performs the scatter as per-vertex-tile masked
matmuls S^T @ dG on the MXU, visiting only vertex tiles actually referenced
by the current point tile (candidate compaction from the idx values).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# weighted row scatter: out[b, idx[b,n,k], :] += w[b,n,k] * g[b,n,:]
# --------------------------------------------------------------------------


def weighted_scatter_rows_jnp(idx: jax.Array, w: jax.Array, g: jax.Array,
                              num_rows: int) -> jax.Array:
    """Reference jnp implementation (XLA scatter-add).

    idx/w: (B, N, k); g: (B, N, F) -> (B, num_rows, F).
    """
    B = idx.shape[0]
    contrib = w[..., None] * g[:, :, None, :]           # (B, N, k, F)
    out = jnp.zeros((B, num_rows, g.shape[-1]), g.dtype)
    b_iota = jnp.arange(B)[:, None, None]
    return out.at[b_iota, idx].add(contrib)


def _scatter_kernel(idx_ref, w_ref, g_ref, out_ref, cand_ref, *,
                    tile_v: int, n_vert_tiles: int, g_t: bool = False):
    """Grid (B, N/TILE_N), sequential. idx/w (1, k, TN); g (1, TN, F);
    out (1, Vp, F) — same block for every point tile of a batch element, so
    it stays VMEM-resident and accumulates across the sequential grid.

    Per point tile: compact the vertex tiles actually referenced by any idx
    into ``cand_ref`` (SMEM), then for each candidate tile build the
    (TILE_V, TN) weighted selection matrix S[v, n] = sum_k w[n,k] *
    [idx[n,k] == v] on the VPU and accumulate S @ g on the MXU."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    k, tn = idx_ref.shape[1], idx_ref.shape[2]
    g = g_ref[0]  # (TN, F), or (F, TN) when g_t

    # candidate vertex tiles referenced by this point tile
    tids = idx_ref[0] // tile_v  # (k, TN)
    cnt = jnp.int32(0)
    for t in range(n_vert_tiles):
        hit = jnp.any(tids == t)

        @pl.when(hit)
        def _(t=t, cnt=cnt):
            cand_ref[cnt] = t

        cnt = cnt + hit.astype(jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_v, tn), 0)  # vert rows

    def body(j, _):
        t = cand_ref[j]
        off = t * tile_v
        S = jnp.zeros((tile_v, tn), jnp.float32)
        for kk in range(k):
            idx_row = idx_ref[0, kk, :].reshape(1, tn) - off
            w_row = w_ref[0, kk, :].reshape(1, tn)
            S = jnp.where(col == idx_row, S + w_row, S)
        upd = jax.lax.dot_general(
            S, g, (((1,), (1 if g_t else 0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TILE_V, F)
        out_ref[0, pl.ds(off, tile_v), :] += upd
        return 0

    jax.lax.fori_loop(0, cnt, body, 0)


@partial(jax.jit, static_argnames=("num_rows", "tile_n", "tile_v",
                                   "interpret", "transposed_in", "g_t"))
def weighted_scatter_rows_pallas(idx: jax.Array, w: jax.Array, g: jax.Array,
                                 num_rows: int, tile_n: int = 1024,
                                 tile_v: int = 512,
                                 interpret: bool = False,
                                 transposed_in: bool = False,
                                 g_t: bool = False) -> jax.Array:
    """Pallas TPU weighted row scatter; same contract as the jnp version.

    transposed_in=True: idx/w arrive as (B, k, N) — the layout the kNN and
    warp-blend kernels natively produce — skipping two retiling
    transposes of 1.5M-row tensors. g stays (B, N, F) unless g_t, in which
    case g is (B, F, N) (rows-native cotangents) and the kernel's MXU
    contraction simply contracts the other dimension."""
    if transposed_in:
        B, k, N = idx.shape
    else:
        B, N, k = idx.shape
    F = g.shape[1] if g_t else g.shape[-1]
    pad_n = (-N) % tile_n
    pad_v = (-num_rows) % tile_v
    Vp = num_rows + pad_v
    n_vt = Vp // tile_v

    # padded points: w = 0 -> contribute nothing (idx pad 0 is in range)
    if transposed_in:
        idx_p = jnp.pad(idx, ((0, 0), (0, 0), (0, pad_n)))
        w_p = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, 0), (0, pad_n)))
    else:
        idx_p = jnp.pad(idx, ((0, 0), (0, pad_n), (0, 0))).transpose(0, 2, 1)
        w_p = jnp.pad(w.astype(jnp.float32),
                      ((0, 0), (0, pad_n), (0, 0))).transpose(0, 2, 1)
    if g_t:
        g_p = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, 0), (0, pad_n)))
    else:
        g_p = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n

    g_spec = (pl.BlockSpec((1, F, tile_n), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM) if g_t else
              pl.BlockSpec((1, tile_n, F), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        partial(_scatter_kernel, tile_v=tile_v, n_vert_tiles=n_vt, g_t=g_t),
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, k, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            g_spec,
        ],
        out_specs=pl.BlockSpec((1, Vp, F), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Vp, F), jnp.float32),
        scratch_shapes=[pltpu.SMEM((n_vt,), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=B * Np * Vp * (3 * k // 4) + 2 * B * Np * Vp * F // 8,
            bytes_accessed=B * (Np * (2 * k + F) * 4 + Vp * F * 4),
            transcendentals=0),
        interpret=interpret,
    )(idx_p, w_p, g_p)
    return out[:, :num_rows].astype(g.dtype)


def _on_tpu() -> bool:
    from animnerf_tpu.utils.platform import on_tpu

    return on_tpu()


def weighted_scatter_rows(idx: jax.Array, w: jax.Array, g: jax.Array,
                          num_rows: int, transposed_in: bool = False,
                          g_t: bool = False) -> jax.Array:
    """Platform dispatcher: Pallas kernel on TPU, XLA scatter elsewhere.
    transposed_in: idx/w are (B, k, N) kernel-native; g_t: g is (B, F, N)
    rows-native (see the pallas variant); the jnp fallback transposes
    them back."""
    if _on_tpu():
        return weighted_scatter_rows_pallas(idx, w, g, num_rows,
                                            transposed_in=transposed_in,
                                            g_t=g_t)
    if transposed_in:
        idx, w = idx.transpose(0, 2, 1), w.transpose(0, 2, 1)
    if g_t:
        g = g.transpose(0, 2, 1)
    return weighted_scatter_rows_jnp(idx, w, g, num_rows)


# --------------------------------------------------------------------------
# gather + blend with custom VJP
# --------------------------------------------------------------------------


def _gather_blend_impl(table: jax.Array, dists: jax.Array, idx: jax.Array,
                       num_lbs: int, weight_std: float, conf_gate: float):
    """One fused gather of [lbs weights | flat transform] per neighbour and
    the confidence-gated blend (reference anim_nerf.py:161-178). The blend
    is an einsum over the flat (F) transform — never materialising a
    (B, N, k, 4, 4) tensor whose tiny trailing dims would lane-pad 32x on
    TPU (measured 5x slower than this layout).

    Returns (blended_dist (B,N,1), blended_flat (B,N,F), w (B,N,k))."""
    B, N, k = idx.shape
    Ft = table.shape[-1]
    g = jnp.take_along_axis(
        table, idx.reshape(B, N * k, 1), axis=1).reshape(B, N, k, Ft)
    neigh_w = g[..., :num_lbs]
    neigh_T = g[..., num_lbs:]

    conf = jnp.exp(
        -jnp.sum(jnp.abs(neigh_w - neigh_w[..., 0:1, :]), axis=-1)
        / (2.0 * weight_std**2)
    )
    gate = (conf > conf_gate).astype(dists.dtype)
    w = jnp.exp(-dists) * gate
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    blended_flat = jnp.einsum("bnk,bnkf->bnf", w, neigh_T,
                              precision=jax.lax.Precision.HIGHEST)
    blended_dist = jnp.sum(w * dists, axis=-1, keepdims=True)
    return blended_dist, blended_flat, w


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gather_blend(table: jax.Array, dists: jax.Array, idx: jax.Array,
                 num_lbs: int, weight_std: float, conf_gate: float):
    """Neighbour gather + transform blend, differentiable ONLY through the
    transform columns of ``table`` (columns num_lbs:).

    ``dists`` and the LBS-weight columns are treated as constants — exactly
    the reference semantics (kNN under no_grad + hard confidence gate whose
    true derivative is zero everywhere). They are stop-gradient'd internally.

    Args:
      table: (B, V, num_lbs + F) per-frame [lbs_weights | flat transform].
      dists: (B, N, k) neighbour distances (ascending; constant).
      idx: (B, N, k) int neighbour indices into V.
    Returns:
      (blended_dist (B, N, 1), blended_flat (B, N, F)).
    """
    bd, bf, _ = _gather_blend_impl(table, jax.lax.stop_gradient(dists), idx,
                                   num_lbs, weight_std, conf_gate)
    return bd, bf


def _gather_blend_fwd(table, dists, idx, num_lbs, weight_std, conf_gate):
    dists = jax.lax.stop_gradient(dists)
    bd, bf, w = _gather_blend_impl(table, dists, idx, num_lbs, weight_std,
                                   conf_gate)
    return (bd, bf), (idx, w, table.shape[1])


def _gather_blend_bwd(num_lbs, weight_std, conf_gate, res, cts):
    idx, w, V = res
    _, d_flat = cts  # d(blended_dist) is dead: blended_dist = f(consts)
    d_t16 = weighted_scatter_rows(idx, w, d_flat, V)
    B = idx.shape[0]
    d_table = jnp.concatenate(
        [jnp.zeros((B, V, num_lbs), d_t16.dtype), d_t16], axis=-1)
    d_dists = jnp.zeros((B,) + idx.shape[1:], d_t16.dtype)
    d_idx = np.zeros(idx.shape, jax.dtypes.float0)
    return d_table, d_dists, d_idx


gather_blend.defvjp(_gather_blend_fwd, _gather_blend_bwd)
