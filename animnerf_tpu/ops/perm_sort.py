"""Permutation-as-sort: gather/scatter compaction without random HBM access.

The rows-compact training step (render/compact_rows.py) needs ~10
gather/scatter ops per step to move survivor samples between the dense
(B, R*K) grid and the compacted (B, cap) working set. XLA's gather/scatter
of a flat f32 array is ~0.03 ms in isolation on this chip, but inside the
real step — where the Pallas kernels' prefetch DMA saturates the memory
system and the 4 MB table cannot live in VMEM — the same op measures
~13 ms (xprof, round 4): 590k random 4-byte HBM reads are latency-bound.

A multi-operand lax.sort of the SAME data streams memory sequentially and
is contention-immune: (16, 65536) with an s32 key + 4 f32 payloads
measures 3.7 ms in isolation and in-program alike. So compaction here is
expressed as applying a PERMUTATION via sort:

    keep (B, N) bool -> keys = where(keep, iota, iota + N)   (all distinct)
    o    = sort(keys, payload=iota)      o[p]   = original index of rank p
    inv  = sort(o,    payload=iota)      inv[i] = rank of original index i

    gather survivors:  sort(vals by inv)[:, :cap]     (survivors first,
                                                       in original order)
    scatter back:      sort(concat([vals_cap, fill]) by o)

Both directions differentiate by applying the INVERSE permutation to the
cotangent — also a sort — via one custom_vjp (`sort_permute`). The
surrounding slice/concat ops supply the zero-padding / slicing of
cotangents for free through their own VJPs.

Unlike index-based compaction there are no padded duplicate lanes: ranks
[n_kept, cap) hold the first DROPPED samples in original order. The
callers rely on the field kernel's own validity test giving those
out-of-shell points sigma == SIGMA_OUTSIDE (zero composite weight, zero
cotangent), which makes scattering their computed outputs exact — see
render/compact_rows.py's exactness note.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _morton_rows(px: jax.Array, py: jax.Array, pz: jax.Array) -> jax.Array:
    """(B, N) coordinate rows -> (B, N) int32 Morton codes (10 bits/axis,
    per-row normalized — any consistent spatial key works here; the codes
    only choose an ORDER). Max value < 2^30."""
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    out = jnp.zeros(px.shape, dtype=jnp.uint32)
    for shift, p in enumerate((px, py, pz)):
        lo = p.min(axis=1, keepdims=True)
        hi = p.max(axis=1, keepdims=True)
        q = jnp.clip((p - lo) / (hi - lo + 1e-9) * 1023.0,
                     0.0, 1023.0).astype(jnp.uint32)
        out = out | (spread(q) << shift)
    return out.astype(jnp.int32)


def compaction_ranks(keep: jax.Array, xyz_rows=None):
    """keep (B, N) bool -> (o, inv, n) rank tables for sort-permutation.

    o   (B, N) s32: o[p] = original index of the sample at rank p
                    (survivors first, then dropped in original order — a
                    full permutation). Survivors keep original order by
                    default; with `xyz_rows` ((px, py, pz) coordinate rows)
                    they are ordered by MORTON CODE instead, making the
                    compacted lanes spatially coherent — what the kNN
                    kernel's vertex-tile skip needs to fire
                    (ops/knn_pallas.py tile_skip). Either order is exact:
                    every downstream kernel is pointwise per lane and
                    expand_channels inverts any permutation; only
                    float accumulation order (weight grads) can differ.
    inv (B, N) s32: inv[i] = rank of original index i (o's inverse).
    n   ()     s32: max per-row survivor count (the capacity check).
    """
    B, N = keep.shape
    iota = lax.broadcasted_iota(jnp.int32, (B, N), 1)
    if xyz_rows is None:
        keys = jnp.where(keep, iota, iota + jnp.int32(N))
        _, o = lax.sort((keys, iota), num_keys=1)
    else:
        m = _morton_rows(*(lax.stop_gradient(p) for p in xyz_rows))
        # kept: morton (< 2^30); dropped: one shared big key — the iota
        # tie-break keeps dropped samples in original order, and makes
        # every (key1, key2) pair distinct (a full permutation)
        keys = jnp.where(keep, m, jnp.int32(0x7FFFFFFF))
        _, _, o = lax.sort((keys, iota, iota), num_keys=2)
    _, inv = lax.sort((o, iota), num_keys=1)
    n = jnp.max(jnp.sum(keep, axis=1)).astype(jnp.int32)
    return o, inv, n


@jax.custom_vjp
def sort_permute(vals: Sequence[jax.Array], fwd_keys: jax.Array,
                 bwd_keys: jax.Array):
    """Apply the permutation encoded by s32 keys to a tuple of (B, N)
    arrays: out[c][b, p] = vals[c][b, j] where fwd_keys[b, j] == p.

    fwd_keys must be a permutation of 0..N-1 per row and bwd_keys its
    inverse (from compaction_ranks: (inv, o) to compact, (o, inv) to
    expand). One fused multi-operand sort moves every channel; the VJP is
    the inverse permutation applied to the cotangents, also one sort.
    """
    out = lax.sort((fwd_keys, *vals), num_keys=1)
    return tuple(out[1:])


def _sp_fwd(vals, fwd_keys, bwd_keys):
    return sort_permute(vals, fwd_keys, bwd_keys), bwd_keys


def _sp_bwd(bwd_keys, cts):
    out = lax.sort((bwd_keys, *cts), num_keys=1)
    return (tuple(out[1:]), None, None)


sort_permute.defvjp(_sp_fwd, _sp_bwd)


def compact_channels(vals: Sequence[jax.Array], o: jax.Array,
                     inv: jax.Array, cap: int):
    """Gather each (B, N) channel's survivors to (B, cap) (ranks beyond
    the survivor count hold dropped samples, NOT duplicates). Cotangents
    of the sliced-away tail are zero-padded by the slice VJP."""
    perm = sort_permute(tuple(vals), inv, o)
    return tuple(lax.slice_in_dim(v, 0, cap, axis=1) for v in perm)


def expand_channels(vals_cap: Sequence[jax.Array], fills, o: jax.Array,
                    inv: jax.Array):
    """Scatter (B, cap) channels back to dense (B, N): ranks >= cap take
    the channel's fill value. The concat VJP slices the cotangent back to
    the compacted width."""
    B, N = o.shape
    cap = vals_cap[0].shape[1]
    full = tuple(
        jnp.concatenate(
            [v, jnp.full((B, N - cap), fill, v.dtype)], axis=1)
        for v, fill in zip(vals_cap, fills))
    return sort_permute(full, o, inv)
