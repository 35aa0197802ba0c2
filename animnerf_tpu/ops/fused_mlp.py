"""Fully-fused positional-encoding + canonical-NeRF MLP Pallas TPU kernel.

The XLA Dense-chain evaluates the 8x256 trunk + heads as one fusion per
layer: every layer's (M, 256) activations round-trip HBM (pre- AND
post-relu are materialised for backward), so the MLP runs at ~25% MFU —
HBM-bandwidth-bound, not MXU-bound (measured 190 ms fwd+bwd for the
flagship step's 2.6M points, tools/bench_mlp.py). A first fused revision
(enc-input, point-major) cut that to 126 ms but still materialised the
(M, 63) f32 positional encoding, its bf16 128-lane padded copy, and the
(M, 63) f32 d_enc cotangent — >2 GB of HBM round trips per step.

This revision works TRANSPOSED — points ride the LANE axis end to end:

  * input is xyz as (8, M) f32 rows [x|y|z|0..] (~31 MB for 2.6M points);
    the sinusoidal encoding (models/embedding.py layout: identity, then
    per-frequency sin/cos blocks) is computed IN REGISTERS per point tile
    — sin/cos are native Mosaic transcendentals;
  * every layer is W^T @ h with h (features, T): weights live VMEM-resident
    across the whole grid, activations never touch HBM;
  * the (rgb | sigma) output is (8, M) — no in-kernel transpose;
  * backward (custom VJP) RE-computes the forward per tile, accumulates all
    weight/bias gradients in VMEM across the sequential grid, and applies
    the encoding chain rule in-kernel, emitting d_xyz as (8, M) directly —
    no d_enc intermediate.

Forward math: trunk (8 layers, skip concat at layer 4 as a split matmul),
sigma head, xyz_final -> dir_0 -> rgb (the use_view=False, no-code
configuration — the flagship male-3-casual path, reference
models/nerf.py:89-153 with freqs_dir=0).

Numerics match the flax path's bfloat16 compute (bf16 operands, f32
accumulation, bf16 rounding between layers; heads accumulate f32; relu
masks compare in f32 — Mosaic lacks packed-bf16 cmpf). Parity is tested in
interpret mode against the flax module (tests/test_fused_mlp.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# static architecture of the flagship NeRF MLP (models/nerf.py): D=8, W=256,
# skip at 4, sigma head f32, xyz_final 256, dir_0 128, rgb 3.
WIDTH = 256
DEPTH = 8
SKIP = 4
DIR_W = 128

# packed weight operand order: trunk 0..7, skip-enc half, sigma, xyz_final,
# dir_0, rgb
N_W = DEPTH + 5


def enc_rows(n_freqs: int) -> int:
    """Padded sublane count of the in-register encoding block."""
    return max(8, -(-(3 + 6 * n_freqs) // 8) * 8)


def pack_params(params: dict, n_freqs: int, dtype=jnp.bfloat16):
    """Flax NeRFMLP param dict -> (ws, bs) tuples of TRANSPOSED arrays.

    Weights (N, K) compute-dtype = flax (K, N) kernels transposed; biases
    (R, 1) f32:
      ws[0]     (256, E)    xyz_0^T (E = enc_rows(n_freqs), zero-padded)
      ws[1..7]  (256, 256)  xyz_1..7^T; ws[4] is the h-half of the skip
                            layer (columns enc_dim: of its (319, 256))
      ws[8]     (256, E)    enc-half of xyz_4^T
      ws[9]     (8, 256)    sigma^T (rows zero-padded from 1)
      ws[10]    (256, 256)  xyz_final^T
      ws[11]    (128, 256)  dir_0^T
      ws[12]    (8, 128)    rgb^T (rows zero-padded from 3)
    The packing is plain jnp (transpose/pad/slice/cast), so autodiff maps
    the fused kernel's packed weight cotangents straight back onto the
    flax pytree.
    """
    p = params["params"] if "params" in params else params
    enc_dim = 3 + 6 * n_freqs
    E = enc_rows(n_freqs)

    def pad_wt(w, r_pad=None, c_pad=None):
        wt = jnp.asarray(w).T
        r_pad = r_pad or wt.shape[0]
        c_pad = c_pad or wt.shape[1]
        return jnp.pad(wt, ((0, r_pad - wt.shape[0]),
                            (0, c_pad - wt.shape[1]))).astype(dtype)

    def pad_b(b, r_pad=None):
        b = jnp.asarray(b)
        r_pad = r_pad or b.shape[0]
        return jnp.pad(b, (0, r_pad - b.shape[0])).reshape(-1, 1).astype(
            jnp.float32)

    ws = [pad_wt(p["xyz_0"]["kernel"], c_pad=E)]
    for i in range(1, DEPTH):
        w = jnp.asarray(p[f"xyz_{i}"]["kernel"])
        if i == SKIP:
            w = w[enc_dim:]  # h-half; enc-half is ws[DEPTH]
        ws.append(pad_wt(w))
    ws.append(pad_wt(jnp.asarray(p[f"xyz_{SKIP}"]["kernel"])[:enc_dim],
                     c_pad=E))
    ws.append(pad_wt(p["sigma"]["kernel"], r_pad=8))
    ws.append(pad_wt(p["xyz_final"]["kernel"]))
    ws.append(pad_wt(p["dir_0"]["kernel"]))
    ws.append(pad_wt(p["rgb"]["kernel"], r_pad=8))

    bs = [pad_b(p[f"xyz_{i}"]["bias"]) for i in range(DEPTH)]
    bs.append(pad_b(jnp.zeros((WIDTH,))))  # skip-enc half: no own bias
    bs.append(pad_b(p["sigma"]["bias"], r_pad=8))
    bs.append(pad_b(p["xyz_final"]["bias"]))
    bs.append(pad_b(p["dir_0"]["bias"]))
    bs.append(pad_b(p["rgb"]["bias"], r_pad=8))
    return tuple(ws), tuple(bs)


def _dot(wt, h):
    """(N, K) x (K, T) -> (N, T) f32 accumulate (bf16 operands on TPU)."""
    return jax.lax.dot_general(wt, h, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_wTd(wt, d):
    """(N, K) x (N, T) -> (K, T): dH = W d (wt is already W^T)."""
    return jax.lax.dot_general(wt, d, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_dxT(d, x):
    """(N, T) x (K, T) -> (N, K): dW^T = d h_in^T."""
    return jax.lax.dot_general(d, x, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _encode_tile(xyz_ref, n_freqs: int, E: int, tile: int):
    """(8, T) xyz rows -> (enc (E, T) f32, per-coord (sin, cos) row lists).

    Row layout matches models/embedding.py: [x, y, z], then per frequency
    the sin block over (x, y, z) followed by the cos block.
    """
    coords = [xyz_ref[0, c, :].reshape(1, tile) for c in range(3)]
    rows = list(coords)
    sins, coss = [], []
    for j in range(n_freqs):
        f = float(2.0 ** j)
        s = [jnp.sin(f * c) for c in coords]
        co = [jnp.cos(f * c) for c in coords]
        rows.extend(s)
        rows.extend(co)
        sins.append(s)
        coss.append(co)
    pad = E - len(rows)
    if pad:
        rows.append(jnp.zeros((pad, tile), jnp.float32))
    return jnp.concatenate(rows, axis=0), sins, coss


def _forward_tile(enc, ws, bs, dtype):
    """Fwd math on one (E, T) encoded tile. Returns (acts, sigma, hf, hd,
    rgb_raw): acts = post-relu trunk activations (bf16, (256, T)); heads
    f32 ((8, T))."""
    h = enc.astype(dtype)
    enc_b = h
    acts = []
    for i in range(DEPTH):
        acc = _dot(ws[i], h)
        if i == SKIP:
            acc = acc + _dot(ws[DEPTH], enc_b)
        h = jnp.maximum(acc.astype(dtype) + bs[i].astype(dtype), 0)
        acts.append(h)
    sigma = _dot(ws[DEPTH + 1], h) + bs[DEPTH + 1]          # (8, T) f32
    hf = (_dot(ws[DEPTH + 2], h).astype(dtype)
          + bs[DEPTH + 2].astype(dtype))                     # no relu
    hd = jnp.maximum(_dot(ws[DEPTH + 3], hf).astype(dtype)
                     + bs[DEPTH + 3].astype(dtype), 0)
    rgb_raw = _dot(ws[DEPTH + 4], hd) + bs[DEPTH + 4]        # (8, T) f32
    return acts, sigma, hf, hd, rgb_raw


def _fwd_kernel(xyz_ref, *wb_refs, n_freqs, E, dtype):
    out_ref = wb_refs[-1]
    ws = [wb_refs[i][...] for i in range(N_W)]
    bs = [wb_refs[N_W + i][...] for i in range(N_W)]
    tile = xyz_ref.shape[-1]
    enc, _, _ = _encode_tile(xyz_ref, n_freqs, E, tile)
    _, sigma, _, _, rgb_raw = _forward_tile(enc, ws, bs, dtype)
    rgb = jax.nn.sigmoid(rgb_raw)
    # rows 0..2 = rgb, row 3 = sigma (sigma's live value is its row 0)
    out_ref[0] = jnp.concatenate(
        [rgb[0:3], sigma[0:1], jnp.zeros_like(rgb[0:4])], axis=0)


@partial(jax.jit, static_argnames=("n_freqs", "tile", "dtype", "interpret"))
def fused_nerf_fwd(xyz_t: jax.Array, ws: tuple, bs: tuple, n_freqs: int = 10,
                   tile: int = 1024, dtype=jnp.bfloat16,
                   interpret: bool = False):
    """xyz_t (1, 8, Mp) rows [x|y|z|0..] -> out (1, 8, Mp) rows
    [r|g|b|sigma|0..] f32. Mp must be a tile multiple (see fused_nerf)."""
    Mp = xyz_t.shape[-1]
    E = enc_rows(n_freqs)

    const_spec = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for w in ws]
    const_spec += [pl.BlockSpec(b.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for b in bs]

    return pl.pallas_call(
        partial(_fwd_kernel, n_freqs=n_freqs, E=E, dtype=dtype),
        grid=(Mp // tile,),
        in_specs=[pl.BlockSpec((1, 8, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)] + const_spec,
        out_specs=pl.BlockSpec((1, 8, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, Mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * (2 * E * WIDTH + (DEPTH - 1) * WIDTH * WIDTH
                            + WIDTH * (8 + WIDTH + DIR_W) + DIR_W * 8),
            bytes_accessed=Mp * 64,
            transcendentals=Mp * (6 * n_freqs + 4),
        ),
        interpret=interpret,
    )(xyz_t, *ws, *bs)


def _bwd_kernel(xyz_ref, dout_ref, *wb_refs, n_freqs, E, dtype):
    w_refs = wb_refs[:N_W]
    b_refs = wb_refs[N_W:2 * N_W]
    dxyz_ref = wb_refs[2 * N_W]
    dw_refs = wb_refs[2 * N_W + 1:2 * N_W + 1 + N_W]
    db_refs = wb_refs[2 * N_W + 1 + N_W:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in list(dw_refs) + list(db_refs):
            r[...] = jnp.zeros_like(r)

    ws = [w_refs[i][...] for i in range(N_W)]
    bs = [b_refs[i][...] for i in range(N_W)]
    tile = xyz_ref.shape[-1]
    enc, sins, coss = _encode_tile(xyz_ref, n_freqs, E, tile)
    acts, sigma, hf, hd, rgb_raw = _forward_tile(enc, ws, bs, dtype)
    enc_b = enc.astype(dtype)
    h7 = acts[-1]

    dout = dout_ref[0]  # (8, T): rows [d_r|d_g|d_b|d_sigma|0..]
    s = jax.nn.sigmoid(rgb_raw)
    row = jax.lax.broadcasted_iota(jnp.int32, dout.shape, 0)
    d_rgb_raw = jnp.where(row < 3, dout, 0.0) * s * (1.0 - s)   # (8, T) f32
    # d_sigma (dout row 3) goes on row 0 to line up with sigma^T's row
    d_sigma8 = jnp.concatenate([dout[3:4], jnp.zeros_like(dout[:7])], axis=0)

    # NB: relu-mask compares run in f32 — Mosaic has no packed-bf16 cmpf
    # rgb head
    d_rgb_b = d_rgb_raw.astype(dtype)
    dw_refs[DEPTH + 4][...] += _dot_dxT(d_rgb_b, hd)
    db_refs[DEPTH + 4][...] += jnp.sum(d_rgb_raw, axis=1, keepdims=True)
    d_hd = _dot_wTd(ws[DEPTH + 4], d_rgb_b).astype(dtype)
    d_hd = jnp.where(hd.astype(jnp.float32) > 0, d_hd, 0)

    # dir_0
    dw_refs[DEPTH + 3][...] += _dot_dxT(d_hd, hf)
    db_refs[DEPTH + 3][...] += jnp.sum(d_hd.astype(jnp.float32), axis=1,
                                       keepdims=True)
    d_hf = _dot_wTd(ws[DEPTH + 3], d_hd).astype(dtype)

    # xyz_final (no relu)
    dw_refs[DEPTH + 2][...] += _dot_dxT(d_hf, h7)
    db_refs[DEPTH + 2][...] += jnp.sum(d_hf.astype(jnp.float32), axis=1,
                                       keepdims=True)

    # sigma head
    d_sig_b = d_sigma8.astype(dtype)
    dw_refs[DEPTH + 1][...] += _dot_dxT(d_sig_b, h7)
    db_refs[DEPTH + 1][...] += jnp.sum(d_sigma8, axis=1, keepdims=True)

    d_h = (_dot_wTd(ws[DEPTH + 1], d_sig_b)
           + _dot_wTd(ws[DEPTH + 2], d_hf)).astype(dtype)

    d_enc = jnp.zeros((E, tile), jnp.float32)
    for i in range(DEPTH - 1, -1, -1):
        h_in = acts[i - 1] if i > 0 else enc_b
        d_h = jnp.where(acts[i].astype(jnp.float32) > 0, d_h, 0)
        dw_refs[i][...] += _dot_dxT(d_h, h_in)
        db_refs[i][...] += jnp.sum(d_h.astype(jnp.float32), axis=1,
                                   keepdims=True)
        if i == SKIP:
            dw_refs[DEPTH][...] += _dot_dxT(d_h, enc_b)
            d_enc = d_enc + _dot_wTd(ws[DEPTH], d_h)
        d_h = _dot_wTd(ws[i], d_h).astype(dtype)
    d_enc = d_enc + d_h.astype(jnp.float32)

    # encoding chain rule, in-register: d_x = d_enc[x row]
    #   + sum_j f_j * (cos(f_j x) * d_sin_row - sin(f_j x) * d_cos_row)
    d_coords = []
    for c in range(3):
        d_c = d_enc[c:c + 1, :]
        for j in range(n_freqs):
            f = float(2.0 ** j)
            srow = 3 + 6 * j + c
            crow = 3 + 6 * j + 3 + c
            d_c = d_c + f * (coss[j][c] * d_enc[srow:srow + 1, :]
                             - sins[j][c] * d_enc[crow:crow + 1, :])
        d_coords.append(d_c)
    d_coords.append(jnp.zeros((5, tile), jnp.float32))
    dxyz_ref[0] = jnp.concatenate(d_coords, axis=0)


@partial(jax.jit, static_argnames=("n_freqs", "tile", "dtype", "interpret"))
def fused_nerf_bwd(xyz_t: jax.Array, ws: tuple, bs: tuple, dout: jax.Array,
                   n_freqs: int = 10, tile: int = 1024, dtype=jnp.bfloat16,
                   interpret: bool = False):
    """VJP of fused_nerf_fwd: (d_xyz_t (1, 8, Mp) f32, d_ws, d_bs)."""
    Mp = xyz_t.shape[-1]
    E = enc_rows(n_freqs)

    const_spec = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for w in ws]
    const_spec += [pl.BlockSpec(b.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for b in bs]
    grad_specs = ([pl.BlockSpec(w.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for w in ws]
                  + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM) for b in bs])

    outs = pl.pallas_call(
        partial(_bwd_kernel, n_freqs=n_freqs, E=E, dtype=dtype),
        grid=(Mp // tile,),
        in_specs=[pl.BlockSpec((1, 8, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)] + const_spec,
        out_specs=[pl.BlockSpec((1, 8, tile), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)] + grad_specs,
        out_shape=([jax.ShapeDtypeStruct((1, 8, Mp), jnp.float32)]
                   + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
                   + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs]),
        cost_estimate=pl.CostEstimate(
            flops=8 * Mp * (2 * E * WIDTH + (DEPTH - 1) * WIDTH * WIDTH
                            + WIDTH * (8 + WIDTH + DIR_W) + DIR_W * 8),
            bytes_accessed=Mp * 128,
            transcendentals=Mp * (6 * n_freqs + 4),
        ),
        interpret=interpret,
    )(xyz_t, dout, *ws, *bs)
    d_xyz_t = outs[0]
    d_ws = tuple(outs[1:1 + N_W])
    d_bs = tuple(outs[1 + N_W:])
    return d_xyz_t, d_ws, d_bs


# ------------------------------------------------------- custom-VJP wrapper


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_core(xyz_t: jax.Array, ws: tuple, bs: tuple, n_freqs: int,
                tile: int, dtype_name: str):
    return fused_nerf_fwd(xyz_t, ws, bs, n_freqs=n_freqs, tile=tile,
                          dtype=jnp.dtype(dtype_name))


def _fused_core_fwd(xyz_t, ws, bs, n_freqs, tile, dtype_name):
    out = fused_nerf_fwd(xyz_t, ws, bs, n_freqs=n_freqs, tile=tile,
                         dtype=jnp.dtype(dtype_name))
    return out, (xyz_t, ws, bs)


def _fused_core_bwd(n_freqs, tile, dtype_name, res, ct):
    xyz_t, ws, bs = res
    # The backward tile is capped at 512 regardless of the forward tile:
    # at tile=1024 the bwd kernel's recomputed activations put its scoped
    # VMEM right at the 16M edge, and programs where XLA co-allocates
    # scoped buffers across the custom call (seen in the rows-compacted
    # train step at the 32768-capacity rung) overflow it by a few hundred
    # KB at compile time. Halving the tile frees ~4MB of headroom and is
    # speed-neutral: the bwd is MXU-bound, measured 37.8 vs 37.6 ms for
    # the 2.6M-point flagship shape (tools/bench_mlp.py::bench_fused).
    # Mp is padded to the fwd tile (a multiple of 512), so the grid stays
    # exact.
    return fused_nerf_bwd(xyz_t, ws, bs, ct, n_freqs=n_freqs,
                          tile=min(tile, 512), dtype=jnp.dtype(dtype_name))


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_nerf(xyz: jax.Array, ws: tuple, bs: tuple, n_freqs: int = 10,
               tile: int = 1024, dtype_name: str = "bfloat16"):
    """Differentiable fused encode+MLP: xyz (M, 3) -> (rgb (M, 3) f32,
    sigma (M, 1) f32).

    First-order differentiable only (custom VJP); the normal-smoothness
    loss keeps the XLA path (query_normal) because it needs grad-of-grad.
    The transposes in/out here are (M, 3)-sized — trivial next to the
    (M, 63)+ f32 encoding round trips they replace.
    """
    M = xyz.shape[0]
    pad_m = (-M) % tile
    xyz_t = jnp.pad(xyz.astype(jnp.float32).T,
                    ((0, 5), (0, pad_m)))[None]  # (1, 8, Mp)
    out = _fused_core(xyz_t, ws, bs, n_freqs, tile, dtype_name)
    return out[0, 0:3, :M].T, out[0, 3:4, :M].T


def fused_nerf_rows(rows: jax.Array, ws: tuple, bs: tuple,
                    n_freqs: int = 10, tile: int = 1024,
                    dtype_name: str = "bfloat16"):
    """Rows-native fused MLP for the transposed pipeline: rows (B, 8, N)
    with xyz in rows 0..2 (rows 3+ ignored by the encoding) ->
    (B, 8, N) rows [r|g|b|sigma|0..]. Batch elements ride the lane axis
    back-to-back — the (B, 8, N) -> (1, 8, B*N) reshape only swaps leading
    dims (no lane/sublane retiling)."""
    B, _, N = rows.shape
    flat = rows.astype(jnp.float32).transpose(1, 0, 2).reshape(1, 8, B * N)
    pad_m = (-(B * N)) % tile
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad_m)))
    out = _fused_core(flat, ws, bs, n_freqs, tile, dtype_name)
    out = out[:, :, :B * N].reshape(8, B, N).transpose(1, 0, 2)
    return out
