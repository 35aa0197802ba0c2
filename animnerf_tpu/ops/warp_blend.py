"""Fully-fused neighbour gather + confidence-gated LBS blend + warp apply.

One Pallas TPU kernel replacing the XLA lowering of the warp's post-kNN
half (reference anim_nerf.py:161-192), which profiled at ~67 ms/step on
the flagship workload: a 176M-rows/s `take_along_axis` over the
(B, V, J+16) table (36 ms) plus loop fusions that materialise the
(B, N, k, J+16) gathered tensor and its gated/weighted forms in HBM
(31 ms). All of that is VMEM-resident here:

  * the per-frame table rides the whole grid as (NC, F, 128) chunks
    (~1.1 MB for SMPL V=6890) — vertices on the LANE axis;
  * per 128-point sub-tile, only the vertex chunks actually referenced by
    some neighbour index are visited (samples along a ray are spatially
    coherent, so that's a handful of the 54 chunks — the same candidate
    pruning that makes the scatter backward in ops/blend.py fast);
  * per candidate chunk the k neighbour rows are fetched with
    `tpu.dynamic_gather` along lanes (a single-vreg lane shuffle — the
    only gather form Mosaic supports, which is exactly why the chunk
    width is 128);
  * the confidence gate, exp(-d) weighting, transform blend, and the
    4x4 warp of xyz (and optionally viewdir) all happen in registers;
    outputs leave as (8, N) rows [x'|y'|z'|blended_dist|vd'|0] — the
    transposed layout ops/fused_mlp.py consumes.

Backward (custom VJP) reuses the scatter-free masked-matmul kernel
(ops/blend.py::weighted_scatter_rows) for d_table and closed-form
R^T-chain for d_xyz: exactly the same gradient contract as gather_blend
(kNN distances and the LBS-weight gate are constants — reference runs
kNN under no_grad and the hard gate's a.e.-derivative is zero).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from animnerf_tpu.ops.blend import weighted_scatter_rows

CHUNK = 128  # vertex chunk width == one vreg of lanes (dynamic_gather limit)


def _warp_blend_kernel(xyz_ref, d_ref, i_ref, tab_ref,
                       out_ref, w_ref, bf_ref, cand_ref, *,
                       k: int, num_lbs: int, n_chunks: int,
                       inv_two_std2: float, conf_gate: float,
                       warp_view: bool):
    F = tab_ref.shape[2]
    tn = xyz_ref.shape[-1]

    for s in range(tn // CHUNK):
        sl = pl.ds(s * CHUNK, CHUNK)
        idxs = i_ref[0, :, sl]                      # (k, 128)
        dk = d_ref[0, :, sl]                        # (k, 128)

        # candidate vertex chunks referenced by this sub-tile
        tids = jax.lax.shift_right_logical(idxs, 7)  # // CHUNK
        cnt = jnp.int32(0)
        for c in range(n_chunks):
            hit = jnp.any(tids == c)

            @pl.when(hit)
            def _(c=c, cnt=cnt):
                cand_ref[cnt] = c

            cnt = cnt + hit.astype(jnp.int32)

        def body(j, g):
            c = cand_ref[j]
            tab = tab_ref[0, c]                     # (F, 128)
            out = []
            for kk in range(k):
                loc = idxs[kk:kk + 1, :] - c * CHUNK        # (1, 128)
                inr = (loc >= 0) & (loc < CHUNK)
                safe = jnp.where(inr, loc, 0)
                gk = jnp.take_along_axis(
                    tab, jnp.broadcast_to(safe, (F, CHUNK)), axis=1)
                out.append(jnp.where(inr, gk, g[kk]))
            return tuple(out)

        g = jax.lax.fori_loop(
            0, cnt, body,
            tuple(jnp.zeros((F, CHUNK), jnp.float32) for _ in range(k)))

        # confidence gate vs neighbour 0 (reference anim_nerf.py:165-171)
        w_rows = []
        for kk in range(k):
            l1 = jnp.sum(jnp.abs(g[kk][:num_lbs] - g[0][:num_lbs]),
                         axis=0, keepdims=True)              # (1, 128)
            conf = jnp.exp(-l1 * inv_two_std2)
            gate = (conf > conf_gate).astype(jnp.float32)
            w_rows.append(jnp.exp(-dk[kk:kk + 1, :]) * gate)
        wsum = w_rows[0]
        for kk in range(1, k):
            wsum = wsum + w_rows[kk]
        w_rows = [w / wsum for w in w_rows]

        bd = w_rows[0] * dk[0:1, :]
        for kk in range(1, k):
            bd = bd + w_rows[kk] * dk[kk:kk + 1, :]

        bf = w_rows[0] * g[0][num_lbs:num_lbs + 16]          # (16, 128)
        for kk in range(1, k):
            bf = bf + w_rows[kk] * g[kk][num_lbs:num_lbs + 16]

        x = xyz_ref[0, 0:1, sl]
        y = xyz_ref[0, 1:2, sl]
        z = xyz_ref[0, 2:3, sl]
        rows = []
        for r in range(3):
            rows.append(bf[4 * r:4 * r + 1] * x
                        + bf[4 * r + 1:4 * r + 2] * y
                        + bf[4 * r + 2:4 * r + 3] * z
                        + bf[4 * r + 3:4 * r + 4])
        rows.append(bd)
        if warp_view:
            vx = xyz_ref[0, 4:5, sl]
            vy = xyz_ref[0, 5:6, sl]
            vz = xyz_ref[0, 6:7, sl]
            # NB the reference warps viewdirs *including* the translation
            # (anim_nerf.py:190 batch_transform pad_ones default)
            for r in range(3):
                rows.append(bf[4 * r:4 * r + 1] * vx
                            + bf[4 * r + 1:4 * r + 2] * vy
                            + bf[4 * r + 2:4 * r + 3] * vz
                            + bf[4 * r + 3:4 * r + 4])
            rows.append(jnp.zeros((1, CHUNK), jnp.float32))
        else:
            rows.append(jnp.zeros((4, CHUNK), jnp.float32))
        out_ref[0, :, sl] = jnp.concatenate(rows, axis=0)
        w_ref[0, :, sl] = jnp.concatenate(w_rows, axis=0)
        bf_ref[0, :, sl] = bf


@partial(jax.jit, static_argnames=("num_lbs", "weight_std", "conf_gate",
                                   "warp_view", "tile_n", "interpret",
                                   "inputs_t", "xyz_rows"))
def warp_blend_fwd_pallas(xyz: jax.Array, viewdir: Optional[jax.Array],
                          dists: jax.Array, idx: jax.Array,
                          table: jax.Array, num_lbs: int,
                          weight_std: float, conf_gate: float,
                          warp_view: bool = False, tile_n: int = 1024,
                          interpret: bool = False, inputs_t: bool = False,
                          xyz_rows: bool = False):
    """xyz (B,N,3), dists/idx (B,N,k), table (B,V,num_lbs+16) ->
    (out (B,8,Np) rows [x'|y'|z'|bd|vd'(3)|0], w (B,k,Np), bf (B,16,Np)).

    inputs_t=True: dists/idx arrive TRANSPOSED as (B, k, N) — the layout
    the kNN kernel natively emits — skipping two 1.5M-row retiling
    transposes. xyz_rows=True: xyz is already the (B, 8, N) row form
    [x|y|z|0|vx|vy|vz|0] (viewdir ignored). Np = N padded to tile_n.
    Padded-point outputs are garbage (their idx pads to 0) — callers
    slice [:N]."""
    if inputs_t:
        B, k, N = idx.shape
    else:
        B, N, k = idx.shape
    V, F = table.shape[1:]
    pad_n = (-N) % tile_n
    Np = N + pad_n
    pad_v = (-V) % CHUNK
    NC = (V + pad_v) // CHUNK
    Fp = F + ((-F) % 8)

    # table -> (B, NC, Fp, CHUNK): vertices ride lanes, chunk-major leading
    tab = jnp.pad(table.astype(jnp.float32),
                  ((0, 0), (0, pad_v), (0, Fp - F)))
    tab = tab.reshape(B, NC, CHUNK, Fp).transpose(0, 1, 3, 2)

    if xyz_rows:
        xyz_t = jnp.pad(xyz.astype(jnp.float32),
                        ((0, 0), (0, 0), (0, pad_n)))
    else:
        # input rows [x|y|z|0|vx|vy|vz|0] — mirrors the output row layout
        rows = [xyz.astype(jnp.float32).transpose(0, 2, 1),        # (B,3,N)
                jnp.zeros((B, 1, N), jnp.float32)]
        if warp_view and viewdir is not None:
            rows.append(viewdir.astype(jnp.float32).transpose(0, 2, 1))
        else:
            rows.append(jnp.zeros((B, 3, N), jnp.float32))
        rows.append(jnp.zeros((B, 1, N), jnp.float32))
        xyz_t = jnp.pad(jnp.concatenate(rows, axis=1),
                        ((0, 0), (0, 0), (0, pad_n)))

    if inputs_t:
        d_t = jnp.pad(dists.astype(jnp.float32), ((0, 0), (0, 0), (0, pad_n)))
        i_t = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, 0), (0, pad_n)))
    else:
        d_t = jnp.pad(dists.astype(jnp.float32).transpose(0, 2, 1),
                      ((0, 0), (0, 0), (0, pad_n)))
        i_t = jnp.pad(idx.astype(jnp.int32).transpose(0, 2, 1),
                      ((0, 0), (0, 0), (0, pad_n)))

    kernel = partial(_warp_blend_kernel, k=k, num_lbs=num_lbs,
                     n_chunks=NC,
                     inv_two_std2=1.0 / (2.0 * float(weight_std) ** 2),
                     conf_gate=float(conf_gate), warp_view=warp_view)
    out, w, bf = pl.pallas_call(
        kernel,
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, 8, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, Fp, CHUNK), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, k, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, 16, Np), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((NC,), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=B * Np * (k * (num_lbs * 3 + 40) + 100),
            bytes_accessed=B * (Np * (8 + 2 * k + 24) * 4
                                + NC * Fp * CHUNK * 4),
            transcendentals=2 * B * Np * k,
        ),
        interpret=interpret,
    )(xyz_t, d_t, i_t, tab)
    return out, w, bf


# ------------------------------------------------- vertex-locality ordering


def morton_codes(verts: jax.Array) -> jax.Array:
    """(B, V, 3) -> (B, V) uint32 Morton (Z-order) codes, 10 bits/axis.

    Sorting vertices by these makes *index* neighbourhoods spatial
    neighbourhoods, which is what the kernel's candidate-chunk pruning
    (and ops/blend.py's candidate-tile scatter) feed on. Real SMPL vertex
    order is only semi-coherent; synthetic rigs can be arbitrary — the
    sort makes coherence intrinsic instead of assumed."""
    lo = verts.min(axis=1, keepdims=True)
    hi = verts.max(axis=1, keepdims=True)
    q = jnp.clip((verts - lo) / (hi - lo + 1e-9) * 1023.0,
                 0.0, 1023.0).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
            | (spread(q[..., 2]) << 2))


@jax.custom_vjp
def permute_rows(x: jax.Array, perm: jax.Array, inv: jax.Array) -> jax.Array:
    """take_along_axis along axis 1 by a PERMUTATION: x (B, V, F),
    perm/inv (B, V) with inv = argsort(perm). The adjoint of a permutation
    is the inverse gather — XLA's default VJP would be a scatter-add
    (~1 GB/s on TPU)."""
    return jnp.take_along_axis(x, perm[..., None], axis=1)


def _permute_rows_fwd(x, perm, inv):
    return jnp.take_along_axis(x, perm[..., None], axis=1), inv


def _permute_rows_bwd(inv, g):
    return jnp.take_along_axis(g, inv[..., None], axis=1), None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


# ------------------------------------------------------- custom-VJP wrapper


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def warp_blend(xyz: jax.Array, viewdir: Optional[jax.Array],
               dists: jax.Array, idx: jax.Array, table: jax.Array,
               num_lbs: int, weight_std: float, conf_gate: float,
               warp_view: bool = False, inputs_t: bool = False):
    """Fused unpose: returns (xyz_cano (B,N,3), viewdir_out, blended_dist
    (B,N,1)). viewdir_out is the warped viewdir when warp_view else the
    input viewdir unchanged (may be None). inputs_t: dists/idx are
    (B, k, N) kernel-native transposed.

    Differentiable through xyz and the 16 transform columns of table;
    dists / the LBS-weight gate are constants (reference semantics)."""
    out, _, _ = warp_blend_fwd_pallas(
        xyz, viewdir, jax.lax.stop_gradient(dists), idx,
        table, num_lbs, weight_std, conf_gate, warp_view=warp_view,
        inputs_t=inputs_t)
    N = xyz.shape[1]
    cano = out[:, 0:3, :N].transpose(0, 2, 1)
    bd = out[:, 3:4, :N].transpose(0, 2, 1)
    vd = out[:, 4:7, :N].transpose(0, 2, 1) if warp_view else viewdir
    return cano, vd, bd


def _warp_blend_fwd(xyz, viewdir, dists, idx, table, num_lbs, weight_std,
                    conf_gate, warp_view, inputs_t):
    dists = jax.lax.stop_gradient(dists)
    out, w, bf = warp_blend_fwd_pallas(
        xyz, viewdir, dists, idx, table, num_lbs, weight_std, conf_gate,
        warp_view=warp_view, inputs_t=inputs_t)
    N = xyz.shape[1]
    cano = out[:, 0:3, :N].transpose(0, 2, 1)
    bd = out[:, 3:4, :N].transpose(0, 2, 1)
    vd = out[:, 4:7, :N].transpose(0, 2, 1) if warp_view else viewdir
    # residuals stay in the kernel's transposed layout — the scatter
    # backward consumes (B, k, N) directly (transposed_in)
    i_t = idx if inputs_t else idx.transpose(0, 2, 1)
    k = i_t.shape[1]
    res = (xyz, viewdir, i_t[:, :, :N], w[:, :, :N], bf[:, :, :N],
           table.shape[1], k)
    return (cano, vd, bd), res


def _warp_blend_bwd(num_lbs, weight_std, conf_gate, warp_view, inputs_t,
                    res, cts):
    xyz, viewdir, i_t, w_t, bf_t, V, k = res
    d_cano, d_vd, _ = cts  # d(blended_dist) is dead: bd = f(consts)
    B, N = xyz.shape[:2]

    # d_bf[b,n,4r+c] = d_cano[b,n,r] * xyzh[b,n,c] (+ viewdir term)
    xyzh = jnp.concatenate([xyz, jnp.ones((B, N, 1), xyz.dtype)], axis=-1)
    d_T3 = d_cano[..., :, None] * xyzh[..., None, :]          # (B,N,3,4)
    if warp_view and viewdir is not None and d_vd is not None:
        vdh = jnp.concatenate([viewdir, jnp.ones((B, N, 1), xyz.dtype)],
                              axis=-1)
        d_T3 = d_T3 + d_vd[..., :, None] * vdh[..., None, :]
    d_bf = jnp.concatenate(
        [d_T3, jnp.zeros((B, N, 1, 4), d_T3.dtype)], axis=-2
    ).reshape(B, N, 16)

    d_t16 = weighted_scatter_rows(i_t, w_t, d_bf, V,
                                  transposed_in=True)         # (B,V,16)
    d_table = jnp.concatenate(
        [jnp.zeros((B, V, num_lbs), d_t16.dtype), d_t16], axis=-1)

    R = bf_t.reshape(B, 4, 4, N)[:, :3, :3]                   # (B,3,3,N)
    d_xyz = jnp.einsum("bijn,bni->bnj", R, d_cano,
                       precision=jax.lax.Precision.HIGHEST)
    if viewdir is None:
        d_viewdir = None
    elif warp_view and d_vd is not None:
        d_viewdir = jnp.einsum("bijn,bni->bnj", R, d_vd,
                               precision=jax.lax.Precision.HIGHEST)
    elif d_vd is not None:
        d_viewdir = d_vd  # vd output was the input passed through
    else:
        d_viewdir = jnp.zeros_like(viewdir)

    dshape = (B, k, N) if inputs_t else (B, N, k)
    d_dists = jnp.zeros(dshape, d_xyz.dtype)
    d_idx = np.zeros(dshape, jax.dtypes.float0)
    return d_xyz, d_viewdir, d_dists, d_idx, d_table


warp_blend.defvjp(_warp_blend_fwd, _warp_blend_bwd)


# ------------------------------------------------- rows-native entry point


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def warp_blend_rows(xyz_t: jax.Array, dists_t: jax.Array, idx_t: jax.Array,
                    table: jax.Array, num_lbs: int, weight_std: float,
                    conf_gate: float):
    """Rows-native fused unpose for the transposed pipeline: xyz_t
    (B, 8, N) rows [x|y|z|0..], dists_t/idx_t (B, k, N) kNN-native ->
    out (B, 8, N) rows [x'|y'|z'|blended_dist|0..]. No viewdir warping
    (the transposed pipeline is gated to unpose_view=False configs).

    Differentiable through xyz rows 0..2 and the transform columns of
    table, like warp_blend."""
    out, _, _ = warp_blend_fwd_pallas(
        xyz_t, None, jax.lax.stop_gradient(dists_t), idx_t, table, num_lbs,
        weight_std, conf_gate, warp_view=False, inputs_t=True,
        xyz_rows=True)
    return out[:, :, :xyz_t.shape[-1]]


def _wbr_fwd(xyz_t, dists_t, idx_t, table, num_lbs, weight_std, conf_gate):
    dists_t = jax.lax.stop_gradient(dists_t)
    out, w, bf = warp_blend_fwd_pallas(
        xyz_t, None, dists_t, idx_t, table, num_lbs, weight_std, conf_gate,
        warp_view=False, inputs_t=True, xyz_rows=True)
    N = xyz_t.shape[-1]
    res = (xyz_t, idx_t, w[:, :, :N], bf[:, :, :N], table.shape[1])
    return out[:, :, :N], res


def _wbr_bwd(num_lbs, weight_std, conf_gate, res, d_out):
    xyz_t, i_t, w_t, bf_t, V = res
    B, _, N = xyz_t.shape
    k = i_t.shape[1]
    d_cano = d_out[:, 0:3]                                   # (B, 3, N)
    # rows 3..7 carry no gradient: blended_dist = f(consts), rest zero

    # d_bf rows: d_bf[4r+c] = d_cano[r] * xyzh[c], r < 3 (row 3 zero)
    ones = jnp.ones((B, 1, N), xyz_t.dtype)
    xyzh = jnp.concatenate([xyz_t[:, 0:3], ones], axis=1)    # (B, 4, N)
    d_bf = jnp.concatenate(
        [d_cano[:, r:r + 1] * xyzh for r in range(3)]
        + [jnp.zeros((B, 4, N), xyz_t.dtype)], axis=1)       # (B, 16, N)

    d_t16 = weighted_scatter_rows(i_t, w_t, d_bf, V, transposed_in=True,
                                  g_t=True)                  # (B, V, 16)
    d_table = jnp.concatenate(
        [jnp.zeros((B, V, num_lbs), d_t16.dtype), d_t16], axis=-1)

    # d_xyz rows: d_x[j] = sum_i R[i, j] * d_cano[i], R[i, j] = bf[4i+j]
    d_rows = []
    for j in range(3):
        acc = bf_t[:, j:j + 1] * d_cano[:, 0:1]
        acc = acc + bf_t[:, 4 + j:5 + j] * d_cano[:, 1:2]
        acc = acc + bf_t[:, 8 + j:9 + j] * d_cano[:, 2:3]
        d_rows.append(acc)
    d_xyz_t = jnp.concatenate(
        d_rows + [jnp.zeros((B, 5, N), xyz_t.dtype)], axis=1)

    d_dists = jnp.zeros((B, k, N), d_xyz_t.dtype)
    d_idx = np.zeros((B, k, N), jax.dtypes.float0)
    return d_xyz_t, d_dists, d_idx, d_table


warp_blend_rows.defvjp(_wbr_fwd, _wbr_bwd)
