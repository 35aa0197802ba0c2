"""Fully-fused canonical-NeRF MLP as a single Pallas TPU kernel.

The XLA Dense-chain evaluates the 8x256 trunk + heads as one fusion per
layer: every layer's (M, 256) activations round-trip HBM (pre- AND
post-relu are materialised for backward), so the MLP runs at ~25% MFU —
HBM-bandwidth-bound, not MXU-bound (measured 190 ms fwd+bwd for the
flagship step's 2.6M points, tools/bench_mlp.py). This kernel keeps all
activations VMEM-resident per point tile and the weights VMEM-resident
across the whole grid: HBM traffic drops to the 63-dim encoded inputs and
the 4-dim outputs.

Forward: one kernel evaluating trunk (8 layers, skip concat at layer 4 as
a split matmul), sigma head, xyz_final -> dir_0 -> rgb head (the
use_view=False, no-code configuration — the flagship male-3-casual path,
reference models/nerf.py:89-153 with freqs_dir=0).

Backward (custom VJP): one kernel per tile RE-computing the forward
(activations never touch HBM) and accumulating all weight/bias gradients
in VMEM across the sequential grid; d(enc) streams out per tile. FLOPs are
4x a forward (vs 3x for store-everything) but it runs at MXU speed instead
of HBM speed.

Numerics match the flax path's bfloat16 compute (bf16 operands, f32
accumulation, bf16 rounding between layers; heads accumulate f32; the
session-default matmul precision is bf16, so the flax heads' f32 dots are
bf16-multiply too). Parity is tested in interpret mode against the flax
module (tests/test_fused_mlp.py).
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
ENC_PAD = 128  # encoded inputs padded to a full lane tile

# packed weight operand order: trunk 0..7, skip-enc half, sigma, xyz_final,
# dir_0, rgb
N_W = DEPTH + 5


def pack_params(params: dict, enc_dim: int, dtype=jnp.bfloat16):
    """Flax NeRFMLP param dict -> (ws, bs) tuples of padded arrays.

    Weights (K_pad, N_pad) in compute dtype; biases (1, N_pad) f32:
      ws[0]     (ENC_PAD, 256)   xyz_0 (K zero-padded from enc_dim)
      ws[1..7]  (256, 256)       xyz_1..7; ws[4] is the h-half of the skip
                                 layer (rows enc_dim: of its (319, 256))
      ws[8]     (ENC_PAD, 256)   enc-half of xyz_4 (rows :enc_dim)
      ws[9]     (256, 8)         sigma (N zero-padded from 1)
      ws[10]    (256, 256)       xyz_final
      ws[11]    (256, DIR_W)     dir_0
      ws[12]    (DIR_W, 8)       rgb (N zero-padded from 3)
    The packing is plain jnp (pad/slice/cast), so autodiff maps the fused
    kernel's padded weight cotangents straight back onto the flax pytree.
    """
    p = params["params"] if "params" in params else params

    def pad_w(w, k_pad=None, n_pad=None):
        w = jnp.asarray(w)
        k_pad = k_pad or w.shape[0]
        n_pad = n_pad or w.shape[1]
        return jnp.pad(w, ((0, k_pad - w.shape[0]),
                           (0, n_pad - w.shape[1]))).astype(dtype)

    def pad_b(b, n_pad=None):
        b = jnp.asarray(b)
        n_pad = n_pad or b.shape[0]
        return jnp.pad(b, (0, n_pad - b.shape[0])).reshape(1, -1).astype(
            jnp.float32)

    ws = [pad_w(p["xyz_0"]["kernel"], k_pad=ENC_PAD)]
    for i in range(1, DEPTH):
        w = jnp.asarray(p[f"xyz_{i}"]["kernel"])
        if i == SKIP:
            w = w[enc_dim:]  # h-half; enc-half is ws[DEPTH]
        ws.append(pad_w(w))
    ws.append(pad_w(jnp.asarray(p[f"xyz_{SKIP}"]["kernel"])[:enc_dim],
                    k_pad=ENC_PAD))
    ws.append(pad_w(p["sigma"]["kernel"], n_pad=8))
    ws.append(pad_w(p["xyz_final"]["kernel"]))
    ws.append(pad_w(p["dir_0"]["kernel"]))
    ws.append(pad_w(p["rgb"]["kernel"], n_pad=8))

    bs = [pad_b(p[f"xyz_{i}"]["bias"]) for i in range(DEPTH)]
    bs.append(pad_b(jnp.zeros((WIDTH,))))  # skip-enc half: no own bias
    bs.append(pad_b(p["sigma"]["bias"], n_pad=8))
    bs.append(pad_b(p["xyz_final"]["bias"]))
    bs.append(pad_b(p["dir_0"]["bias"]))
    bs.append(pad_b(p["rgb"]["bias"], n_pad=8))
    return tuple(ws), tuple(bs)


def _dot(a, b):
    """(T, K) x (K, N) -> (T, N) f32 accumulate (bf16 operands on TPU)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_wT(d, w):
    """(T, N) x (K, N) -> (T, K): dX = d W^T."""
    return jax.lax.dot_general(d, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_xT(x, d):
    """(T, K) x (T, N) -> (K, N): dW = x^T d."""
    return jax.lax.dot_general(x, d, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_tile(enc, ws, bs, dtype):
    """Fwd math on one (T, ENC_PAD) tile. Returns (acts, sigma, hf, hd,
    rgb_raw): acts = post-relu trunk activations (bf16), heads f32."""
    h = enc
    acts = []
    for i in range(DEPTH):
        acc = _dot(h, ws[i])
        if i == SKIP:
            acc = acc + _dot(enc, ws[DEPTH])
        h = jnp.maximum(acc.astype(dtype) + bs[i].astype(dtype), 0)
        acts.append(h)
    sigma = _dot(h, ws[DEPTH + 1]) + bs[DEPTH + 1]          # (T, 8) f32
    hf = (_dot(h, ws[DEPTH + 2]).astype(dtype)
          + bs[DEPTH + 2].astype(dtype))                     # no relu
    hd = jnp.maximum(_dot(hf, ws[DEPTH + 3]).astype(dtype)
                     + bs[DEPTH + 3].astype(dtype), 0)
    rgb_raw = _dot(hd, ws[DEPTH + 4]) + bs[DEPTH + 4]        # (T, 8) f32
    return acts, sigma, hf, hd, rgb_raw


def _fwd_kernel(enc_ref, *wb_refs, dtype):
    out_ref = wb_refs[-1]
    ws = [wb_refs[i][...] for i in range(N_W)]
    bs = [wb_refs[N_W + i][...] for i in range(N_W)]
    enc = enc_ref[...]
    _, sigma, _, _, rgb_raw = _forward_tile(enc, ws, bs, dtype)
    rgb = jax.nn.sigmoid(rgb_raw)
    packed = jnp.concatenate([rgb[:, 0:3], sigma[:, 0:1],
                              jnp.zeros_like(rgb[:, 0:4])], axis=1)
    out_ref[...] = packed.T  # (8, T): last block dim must be lane-sized


@partial(jax.jit, static_argnames=("tile", "dtype", "interpret"))
def fused_nerf_fwd(enc: jax.Array, ws: tuple, bs: tuple, tile: int = 512,
                   dtype=jnp.bfloat16, interpret: bool = False):
    """enc (M, enc_dim<=ENC_PAD) -> (rgb (M, 3) f32, sigma (M, 1) f32)."""
    M, E = enc.shape
    pad_m = (-M) % tile
    enc_p = jnp.pad(enc.astype(dtype), ((0, pad_m), (0, ENC_PAD - E)))
    Mp = M + pad_m

    const_spec = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for w in ws]
    const_spec += [pl.BlockSpec(b.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for b in bs]

    out = pl.pallas_call(
        partial(_fwd_kernel, dtype=dtype),
        grid=(Mp // tile,),
        in_specs=[pl.BlockSpec((tile, ENC_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + const_spec,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * (2 * ENC_PAD * WIDTH + (DEPTH - 1) * WIDTH * WIDTH
                            + WIDTH * (8 + WIDTH + DIR_W) + DIR_W * 8),
            bytes_accessed=Mp * (ENC_PAD * 2 + 64),
            transcendentals=Mp * 4,
        ),
        interpret=interpret,
    )(enc_p, *ws, *bs)
    return out[0:3, :M].T, out[3:4, :M].T


def _bwd_kernel(enc_ref, dout_ref, *wb_refs, dtype):
    w_refs = wb_refs[:N_W]
    b_refs = wb_refs[N_W:2 * N_W]
    denc_ref = wb_refs[2 * N_W]
    dw_refs = wb_refs[2 * N_W + 1:2 * N_W + 1 + N_W]
    db_refs = wb_refs[2 * N_W + 1 + N_W:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in list(dw_refs) + list(db_refs):
            r[...] = jnp.zeros_like(r)

    ws = [w_refs[i][...] for i in range(N_W)]
    bs = [b_refs[i][...] for i in range(N_W)]
    enc = enc_ref[...]
    acts, sigma, hf, hd, rgb_raw = _forward_tile(enc, ws, bs, dtype)
    h7 = acts[-1]

    dout = dout_ref[...].T  # (T, 8): [d_rgb(3) | d_sigma(1) | 0 pad]
    s = jax.nn.sigmoid(rgb_raw)
    rgb_mask = (jax.lax.broadcasted_iota(jnp.int32, dout.shape, 1) < 3)
    d_rgb_raw = jnp.where(rgb_mask, dout, 0.0) * s * (1.0 - s)  # (T,8) f32
    d_sigma8 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, dout.shape, 1) == 3, dout, 0.0)
    # move d_sigma into lane 0 so it lines up with sigma's weight column
    d_sigma8 = jnp.concatenate(
        [jnp.sum(d_sigma8, axis=1, keepdims=True),
         jnp.zeros_like(d_sigma8[:, :7])], axis=1)

    # rgb head
    d_rgb_b = d_rgb_raw.astype(dtype)
    dw_refs[DEPTH + 4][...] += _dot_xT(hd, d_rgb_b)
    db_refs[DEPTH + 4][...] += jnp.sum(d_rgb_raw, axis=0, keepdims=True)
    # NB: relu-mask compares run in f32 — Mosaic has no packed-bf16 cmpf
    d_hd = _dot_wT(d_rgb_b, ws[DEPTH + 4]).astype(dtype)
    d_hd = jnp.where(hd.astype(jnp.float32) > 0, d_hd, 0)

    # dir_0
    dw_refs[DEPTH + 3][...] += _dot_xT(hf, d_hd)
    db_refs[DEPTH + 3][...] += jnp.sum(d_hd.astype(jnp.float32), axis=0,
                                       keepdims=True)
    d_hf = _dot_wT(d_hd, ws[DEPTH + 3]).astype(dtype)

    # xyz_final (no relu)
    dw_refs[DEPTH + 2][...] += _dot_xT(h7, d_hf)
    db_refs[DEPTH + 2][...] += jnp.sum(d_hf.astype(jnp.float32), axis=0,
                                       keepdims=True)

    # sigma head
    d_sig_b = d_sigma8.astype(dtype)
    dw_refs[DEPTH + 1][...] += _dot_xT(h7, d_sig_b)
    db_refs[DEPTH + 1][...] += jnp.sum(d_sigma8, axis=0, keepdims=True)

    d_h = (_dot_wT(d_sig_b, ws[DEPTH + 1])
           + _dot_wT(d_hf, ws[DEPTH + 2])).astype(dtype)

    d_enc_acc = jnp.zeros((enc.shape[0], ENC_PAD), jnp.float32)
    for i in range(DEPTH - 1, -1, -1):
        h_in = acts[i - 1] if i > 0 else enc
        d_h = jnp.where(acts[i].astype(jnp.float32) > 0, d_h, 0)
        dw_refs[i][...] += _dot_xT(h_in, d_h)
        db_refs[i][...] += jnp.sum(d_h.astype(jnp.float32), axis=0,
                                   keepdims=True)
        if i == SKIP:
            dw_refs[DEPTH][...] += _dot_xT(enc, d_h)
            d_enc_acc = d_enc_acc + _dot_wT(d_h, ws[DEPTH])
        d_h = _dot_wT(d_h, ws[i]).astype(dtype)
    d_enc_acc = d_enc_acc + d_h.astype(jnp.float32)
    denc_ref[...] = d_enc_acc


@partial(jax.jit, static_argnames=("tile", "dtype", "interpret"))
def fused_nerf_bwd(enc: jax.Array, ws: tuple, bs: tuple, d_rgb: jax.Array,
                   d_sigma: jax.Array, tile: int = 512, dtype=jnp.bfloat16,
                   interpret: bool = False):
    """VJP of fused_nerf_fwd: (d_enc (M, enc_dim) f32, d_ws, d_bs)."""
    M, E = enc.shape
    pad_m = (-M) % tile
    enc_p = jnp.pad(enc.astype(dtype), ((0, pad_m), (0, ENC_PAD - E)))
    dout = jnp.concatenate(
        [d_rgb.astype(jnp.float32), d_sigma.astype(jnp.float32),
         jnp.zeros((M, 4), jnp.float32)], axis=1)
    dout = jnp.pad(dout, ((0, pad_m), (0, 0))).T  # (8, Mp)
    Mp = M + pad_m

    const_spec = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for w in ws]
    const_spec += [pl.BlockSpec(b.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for b in bs]
    grad_specs = ([pl.BlockSpec(w.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for w in ws]
                  + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM) for b in bs])

    outs = pl.pallas_call(
        partial(_bwd_kernel, dtype=dtype),
        grid=(Mp // tile,),
        in_specs=[pl.BlockSpec((tile, ENC_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + const_spec,
        out_specs=[pl.BlockSpec((tile, ENC_PAD), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] + grad_specs,
        out_shape=([jax.ShapeDtypeStruct((Mp, ENC_PAD), jnp.float32)]
                   + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
                   + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs]),
        cost_estimate=pl.CostEstimate(
            flops=8 * Mp * (2 * ENC_PAD * WIDTH + (DEPTH - 1) * WIDTH * WIDTH
                            + WIDTH * (8 + WIDTH + DIR_W) + DIR_W * 8),
            bytes_accessed=Mp * (ENC_PAD * 6 + 64),
            transcendentals=Mp * 4,
        ),
        interpret=interpret,
    )(enc_p, dout, *ws, *bs)
    d_enc = outs[0][:M, :E]
    d_ws = tuple(outs[1:1 + N_W])
    d_bs = tuple(outs[1 + N_W:])
    return d_enc, d_ws, d_bs


# ------------------------------------------------------- custom-VJP wrapper


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_nerf(enc: jax.Array, ws: tuple, bs: tuple, tile: int = 512,
               dtype_name: str = "bfloat16"):
    """Differentiable fused MLP: enc (M, E) -> (rgb (M, 3), sigma (M, 1)).

    First-order differentiable only (custom VJP); the normal-smoothness
    loss keeps the XLA path (query_normal) because it needs grad-of-grad.
    """
    return fused_nerf_fwd(enc, ws, bs, tile=tile, dtype=jnp.dtype(dtype_name))


def _fused_fwd(enc, ws, bs, tile, dtype_name):
    out = fused_nerf_fwd(enc, ws, bs, tile=tile, dtype=jnp.dtype(dtype_name))
    return out, (enc, ws, bs)


def _fused_bwd(tile, dtype_name, res, cts):
    enc, ws, bs = res
    d_rgb, d_sigma = cts
    return fused_nerf_bwd(enc, ws, bs, d_rgb, d_sigma, tile=tile,
                          dtype=jnp.dtype(dtype_name))


fused_nerf.defvjp(_fused_fwd, _fused_bwd)
