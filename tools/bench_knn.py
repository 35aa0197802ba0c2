"""Micro-benchmark of kNN kernel variants on the flagship workload shapes.

16 x 65536 coarse points (and 16 x 32768 fine) vs V=6890 verts, k=4.
Variants: current VPU-d2 kernel, min-dist pre-pass, and an MXU-d2
prototype (d2 as ONE (tile_v,8)x(8,tile_n) matmul — no lane broadcasts).

Usage: python tools/bench_knn.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_BIG = 1e9


def _mxu_knn_kernel(points_ref, verts_ref, out_d_ref, out_i_ref,
                    top_d, top_i, *, k: int, tile_v: int, n_vert_tiles: int,
                    precision):
    """points (1, 8, TN) rows [x,y,z,p2,1,0,0,0]; verts (1, Vp, 8) rows
    [-2x,-2y,-2z,1,v2,0,0,0]. d2 = verts_tile @ points = v2 - 2vp + p2."""
    tile_n = points_ref.shape[-1]
    P = points_ref[0]  # (8, TN)

    top_d[:] = jnp.full((k, tile_n), jnp.inf, dtype=jnp.float32)
    top_i[:] = jnp.zeros((k, tile_n), dtype=jnp.int32)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (k, tile_n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_v, tile_n), 0)

    def tile_body(t, _):
        off = t * tile_v
        A = verts_ref[0, pl.ds(off, tile_v), :]  # (TV, 8)
        d2 = jax.lax.dot_general(
            A, P, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)  # (TV, TN)
        for _s in range(k):
            m = jnp.min(d2, axis=0, keepdims=True)
            am = jnp.argmin(d2, axis=0).astype(jnp.int32)
            cur_max = jnp.max(top_d[:], axis=0, keepdims=True)
            cur_am = jnp.argmax(top_d[:], axis=0).astype(jnp.int32)
            repl = (slot_iota == cur_am[None, :]) & (m < cur_max)
            top_d[:] = jnp.where(repl, m, top_d[:])
            top_i[:] = jnp.where(repl, (am + off)[None, :], top_i[:])
            d2 = jnp.where(col == am[None, :], jnp.inf, d2)
        return 0

    jax.lax.fori_loop(0, n_vert_tiles, tile_body, 0)

    def cswap(a, b):
        da, db = top_d[a, :], top_d[b, :]
        ia, ib = top_i[a, :], top_i[b, :]
        swap = da > db
        top_d[a, :] = jnp.where(swap, db, da)
        top_d[b, :] = jnp.where(swap, da, db)
        top_i[a, :] = jnp.where(swap, ib, ia)
        top_i[b, :] = jnp.where(swap, ia, ib)

    for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        cswap(a, b)

    out_d_ref[0] = jnp.sqrt(jnp.maximum(top_d[:], 0.0))
    out_i_ref[0] = top_i[:]


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_v", "interpret",
                                   "precision"))
def knn_mxu(points, verts, k=4, tile_n=1024, tile_v=512, interpret=False,
            precision=jax.lax.Precision.HIGHEST):
    B, N, _ = points.shape
    V = verts.shape[1]
    points = jax.lax.stop_gradient(points).astype(jnp.float32)
    verts = jax.lax.stop_gradient(verts).astype(jnp.float32)

    # center by the per-batch vertex centroid to bound |p|^2/|v|^2 (the
    # matmul form's cancellation error scales with their magnitudes)
    c = jnp.mean(verts, axis=1, keepdims=True)
    p = points - c
    v = verts - c

    pad_n = (-N) % tile_n
    pad_v = (-V) % tile_v
    p = jnp.pad(p, ((0, 0), (0, pad_n), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, pad_v), (0, 0)), constant_values=_BIG)
    Np, Vp = N + pad_n, V + pad_v

    p2 = jnp.sum(p * p, axis=-1)
    v2 = jnp.sum(v * v, axis=-1)
    zeros_p = jnp.zeros((B, Np), jnp.float32)
    pts_aug = jnp.stack([p[..., 0], p[..., 1], p[..., 2], p2,
                         jnp.ones((B, Np), jnp.float32),
                         zeros_p, zeros_p, zeros_p], axis=1)  # (B, 8, Np)
    zeros_v = jnp.zeros((B, Vp), jnp.float32)
    verts_aug = jnp.stack([-2 * v[..., 0], -2 * v[..., 1], -2 * v[..., 2],
                           jnp.ones((B, Vp), jnp.float32), v2,
                           zeros_v, zeros_v, zeros_v], axis=2)  # (B, Vp, 8)

    out_d, out_i = pl.pallas_call(
        partial(_mxu_knn_kernel, k=k, tile_v=tile_v,
                n_vert_tiles=Vp // tile_v, precision=precision),
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, 8, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, 8), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, k, Np), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, tile_n), jnp.float32),
            pltpu.VMEM((k, tile_n), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * B * Np * Vp, bytes_accessed=B * (Np + Vp) * 32,
            transcendentals=0),
        interpret=interpret,
    )(pts_aug, verts_aug)
    d = out_d.transpose(0, 2, 1)[:, :N]
    i = out_i.transpose(0, 2, 1)[:, :N]
    return d, i



def bench(fn, pts_list, verts, n=8):
    """Every call — warmup AND timed — uses a NEVER-SEEN input: the axon
    runtime dedups any execution whose inputs it has seen before
    (PERF.md gotcha), so even cycling a fixed list fakes the timing."""
    assert len(pts_list) >= n + 2
    force = lambda o: jax.device_get(jnp.sum(o[0]))
    for p in pts_list[:2]:
        force(fn(p, verts))
    t0 = time.perf_counter()
    for s in range(n):
        # device_get forces execution — on this runtime block_until_ready
        # does NOT (lazy buffers), and repeated inputs are deduped
        force(fn(pts_list[2 + s], verts))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from animnerf_tpu.ops.knn_pallas import knn_pallas, min_dist_pallas

    rng = np.random.default_rng(0)
    B, N, V = 16, 65536, 6890
    # body-like cloud + ray-like points
    verts = jnp.asarray(rng.normal(scale=0.3, size=(B, V, 3)).astype(np.float32))
    pts_list = []
    for s in range(10):
        o = rng.normal(scale=0.1, size=(B, N, 3)).astype(np.float32)
        o[..., 2] += 3.0
        t = rng.uniform(2.0, 4.0, size=(B, N, 1)).astype(np.float32)
        d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
        pts_list.append(jnp.asarray((o + t * d).astype(np.float32)))
    pts = pts_list[0]

    ms = bench(lambda p, v: knn_pallas(p, v, k=4), pts_list, verts)
    print(f"knn_pallas (VPU d2)              : {ms:7.2f} ms")
    ms = bench(lambda p, v: min_dist_pallas(p, v), pts_list, verts)
    print(f"min_dist_pallas                  : {ms:7.2f} ms")
    # packed variant: bench the PRODUCTION kernel (ops/knn_pallas.py),
    # not a local copy that could drift from what ships
    ms = bench(lambda p, v: knn_pallas(p, v, k=4, packed=True,
                                       tournament=False),
               pts_list, verts)
    print(f"knn_pallas packed (d2bits|idx)   : {ms:7.2f} ms")
    ms = bench(lambda p, v: knn_pallas(p, v, k=4, packed=True,
                                       tournament=True),
               pts_list, verts)
    print(f"knn_pallas packed tournament     : {ms:7.2f} ms")
    d_ref, i_ref = knn_pallas(pts[:2, :4096], verts[:2], k=4)
    d_new, i_new = knn_pallas(pts[:2, :4096], verts[:2], k=4, packed=True,
                              tournament=False)
    rel = np.abs(np.asarray(d_ref) - np.asarray(d_new)) / (np.asarray(d_ref) + 1e-12)
    mism = int(jnp.sum(i_ref != i_new))
    print(f"packed: max rel d err {rel.max():.2e}; idx mismatch {mism}/{i_ref.size}")
    d_t, i_t = knn_pallas(pts[:2, :4096], verts[:2], k=4, packed=True,
                          tournament=True)
    print(f"tournament vs packed bit-equal: d {bool(jnp.all(d_t == d_new))} "
          f"i {bool(jnp.all(i_t == i_new))}")
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        ms = bench(lambda p, v: knn_mxu(p, v, k=4, precision=prec),
                   pts_list, verts)
        print(f"knn_mxu ({str(prec):18s})    : {ms:7.2f} ms")

    # correctness vs current kernel
    d_ref, i_ref = knn_pallas(pts[:2, :4096], verts[:2], k=4)
    d_new, i_new = knn_mxu(pts[:2, :4096], verts[:2], k=4)
    d_err = float(jnp.max(jnp.abs(d_ref - d_new)))
    mism = int(jnp.sum(i_ref != i_new))
    print(f"HIGHEST: max |d| err vs VPU kernel: {d_err:.2e}; "
          f"idx mismatches: {mism}/{i_ref.size}")
    # mismatched lanes: are they ties?
    if mism:
        mask = np.asarray(i_ref != i_new)
        print("  mismatch d_ref", np.asarray(d_ref)[mask][:5],
              "d_new", np.asarray(d_new)[mask][:5])


if __name__ == "__main__":
    main()
