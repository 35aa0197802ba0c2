"""Tile-local stream compaction on the MXU.

XLA's select/gather/scatter ops cost ~15-20 ms each at 1M+ rows on TPU
(latency-bound — see PERF.md), which made sample compaction through
jnp.nonzero + take_along_axis a net loss for training even though ~60% of
the warp/MLP work is on provably-invalid samples. This pair of Pallas
kernels compacts with MATMULS instead:

  * the sample stream is cut into tiles of `tile_n`; each tile keeps its
    survivors in order via a one-hot selection matrix S (cap_t x tile_n),
    built in VMEM from an intra-tile prefix sum of the keep mask (a
    triangular matmul — Mosaic has no cumsum), and a single MXU matmul
    compacted = payload @ S^T (one 1 per S row: an exact column copy);
  * every tile gets the same static capacity `cap_t` — survivor fractions
    concentrate tightly around the global rate for shuffled training
    samples, so cap_t carries a little headroom and the per-tile counts
    are returned for the caller's overflow-retry logic (exactly the
    CompactTrainer pattern);
  * scatter-back is the transpose: dense = values @ S + (1 - keep) * fill
    — and the two kernels are each other's VJP, so gradients flow with the
    same bandwidth-bound cost.

Layout: SAMPLES ON LANES, channels on sublanes — (B, C, N) arrays with
(1, C, tile_n) blocks. A point-major (B, N, C) layout would pad the
C-channel minor dim to 128 lanes in the TPU's (8,128) tiling (a 128/C
memory amplification that made a first version ~10x slower). The keep
mask rides as channel 0 of the packed payload for the same reason.

Everything is static-shaped, fully parallel over the grid, and
bandwidth/MXU-bound rather than op-latency-bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _select_matrix(keep_row: jax.Array, cap_t: int, tile_n: int):
    """(1, tile_n) 0/1 keep row -> S (cap_t, tile_n) one-hot with
    S[i, j] = 1 iff sample j is the tile's i-th survivor."""
    # inclusive prefix along lanes via an upper-triangular matmul
    ri = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_n), 1)
    triu = jnp.where(ri <= ci, 1.0, 0.0)
    prefix = jax.lax.dot_general(
        keep_row, triu, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (1, tile_n)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap_t, tile_n),
                                    0).astype(jnp.float32)
    return jnp.where((rows == prefix - 1.0) & (keep_row > 0.5), 1.0, 0.0)


def _compact_kernel(pk_ref, out_ref, *, cap_t: int):
    """pk (1, C+1, tile_n) with keep in channel 0 -> out (1, C+1, cap_t)."""
    tile_n = pk_ref.shape[-1]
    keep_row = pk_ref[0, 0:1, :]  # (1, tile_n)
    s = _select_matrix(keep_row, cap_t, tile_n)
    # payload @ S^T: contract the tile_n dim — exact survivor-column copy
    out_ref[0] = jax.lax.dot_general(
        pk_ref[0], s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _scatter_kernel(keep_ref, vals_ref, fill_ref, out_ref, *, cap_t: int):
    """keep (1, 8, tile_n) (row 0 meaningful), vals (1, C, cap_t),
    fill (1, C, 128) (col 0 meaningful) -> dense (1, C, tile_n)."""
    tile_n = keep_ref.shape[-1]
    keep_row = keep_ref[0, 0:1, :]
    s = _select_matrix(keep_row, cap_t, tile_n)
    dense = jax.lax.dot_general(
        vals_ref[0], s, (((1,), (0,)), ((), ())),  # vals @ S
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    fill = fill_ref[0, :, 0:1]  # (C, 1)
    out_ref[0] = jnp.where(keep_row > 0.5, dense, fill)


@partial(jax.jit, static_argnames=("cap_t", "tile_n", "interpret"))
def _compact_impl(keep: jax.Array, payload: jax.Array, cap_t: int,
                  tile_n: int, interpret: bool):
    """keep (B, N), payload (B, C, N) -> ((B, C, nT*cap_t), counts)."""
    B, C, N = payload.shape
    nT = N // tile_n
    pk = jnp.concatenate(
        [keep.astype(jnp.float32)[:, None], payload.astype(jnp.float32)],
        axis=1)  # (B, C+1, N)
    out = pl.pallas_call(
        partial(_compact_kernel, cap_t=cap_t),
        grid=(B, nT),
        in_specs=[pl.BlockSpec((1, C + 1, tile_n), lambda b, t: (b, 0, t))],
        out_specs=pl.BlockSpec((1, C + 1, cap_t),
                               lambda b, t: (b * nT + t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nT, C + 1, cap_t), jnp.float32),
        interpret=interpret,
    )(pk)
    out = out.reshape(B, nT, C + 1, cap_t)[:, :, 1:]  # drop the keep row
    out = out.transpose(0, 2, 1, 3).reshape(B, C, nT * cap_t)
    cnt = jnp.sum(keep.reshape(B, nT, tile_n), axis=-1).astype(jnp.int32)
    return out, cnt


@partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _scatter_impl(keep: jax.Array, vals: jax.Array, fill: jax.Array,
                  tile_n: int, interpret: bool):
    """keep (B, N), vals (B, C, nT*cap_t), fill (C,) -> (B, C, N)."""
    B, N = keep.shape
    nT = N // tile_n
    C = vals.shape[1]
    cap_t = vals.shape[-1] // nT
    keep8 = jnp.broadcast_to(keep.astype(jnp.float32)[:, None],
                             (B, 8, N))  # 8-sublane legal block shape
    vals_t = vals.reshape(B, C, nT, cap_t).transpose(0, 2, 1, 3) \
        .reshape(B * nT, C, cap_t)
    fill_t = jnp.broadcast_to(
        fill.astype(jnp.float32).reshape(1, C, 1), (1, C, 128))
    out = pl.pallas_call(
        partial(_scatter_kernel, cap_t=cap_t),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 8, tile_n), lambda b, t: (b, 0, t)),
            pl.BlockSpec((1, C, cap_t), lambda b, t: (b * nT + t, 0, 0)),
            pl.BlockSpec((1, C, 128), lambda b, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, tile_n), lambda b, t: (b, 0, t)),
        out_shape=jax.ShapeDtypeStruct((B, C, N), jnp.float32),
        interpret=interpret,
    )(keep8, vals_t, fill_t)
    return out


# ------------------------------------------------------------ public ops

@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def tile_compact(keep: jax.Array, payload: jax.Array, cap_t: int = 256,
                 tile_n: int = 512, interpret: bool = False):
    """keep (B, N) bool, payload (B, C, N) -> (compacted (B, C, nT*cap_t),
    counts (B, nT) int32).

    Tile t's survivors occupy compacted[..., t*cap_t : t*cap_t + count_t]
    in stream order; remaining slots are zero. counts > cap_t means
    survivors were dropped in that tile — callers re-run at a larger cap_t
    (exact retry). N must be a tile_n multiple (pad `keep` with False)."""
    return _compact_impl(keep, payload, cap_t, tile_n, interpret)


def _tc_fwd(keep, payload, cap_t, tile_n, interpret):
    out, cnt = _compact_impl(keep, payload, cap_t, tile_n, interpret)
    return (out, cnt), keep


def _tc_bwd(cap_t, tile_n, interpret, keep, g):
    g_out, _ = g
    C = g_out.shape[1]
    g_payload = _scatter_impl(keep, g_out, jnp.zeros((C,), jnp.float32),
                              tile_n, interpret)
    return None, g_payload


tile_compact.defvjp(_tc_fwd, _tc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tile_scatter(keep: jax.Array, vals: jax.Array, fill: jax.Array,
                 tile_n: int = 512, interpret: bool = False):
    """Inverse of tile_compact: vals (B, C, nT*cap_t) scattered back into
    (B, C, N); non-survivor columns take `fill` (C,). Extra per-tile slots
    (beyond that tile's survivor count) are ignored."""
    return _scatter_impl(keep, vals, fill, tile_n, interpret)


def _ts_fwd(keep, vals, fill, tile_n, interpret):
    out = _scatter_impl(keep, vals, fill, tile_n, interpret)
    cap_t = vals.shape[-1] // (keep.shape[1] // tile_n)
    return out, (keep, cap_t)


def _ts_bwd(tile_n, interpret, res, g):
    keep, cap_t = res
    g_vals, _ = _compact_impl(keep, g, cap_t, tile_n, interpret)
    # fill cotangent: sum of g over non-kept columns, per channel
    g_fill = jnp.sum(
        jnp.where(keep[:, None] > 0.5, 0.0, g), axis=(0, 2))
    return None, g_vals, g_fill


tile_scatter.defvjp(_ts_fwd, _ts_bwd)
