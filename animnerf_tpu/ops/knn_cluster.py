"""Two-stage cluster-pruned kNN against the SMPL vertex cloud.

The exact kNN kernel (ops/knn_pallas.py) sweeps all V vertices for every
query point; its k extract-min passes over every vertex tile dominate the
cost (PERF.md item 2). This module prunes the sweep with an exact
cluster-bound argument:

  1. The vertices are partitioned into C equal-size spatial clusters by a
     vectorised kd-split of the POSED cloud (segmented argsorts over
     cycling axes — a balanced kd-tree's leaf order). Per-cluster
     centroids/radii are computed with masking so padded slots never
     affect the bounds.
  2. Stage 1 (plain XLA, runs on the MXU/VPU): per-point distances to the
     C centroids give upper/lower bounds per cluster
     (ub = d + r, lb = max(d - r, 0)). The 4th-smallest ub over distinct
     non-empty clusters bounds the true 4th-NN distance, so any cluster
     with lb > ub4 provably holds no top-4 vertex and is dropped. Ray
     samples are spatially coherent, so the union of needed clusters over
     a point TILE is small; points farther than `thr` from every cluster
     are excluded from voting (far-skip semantics, see below).
  3. Stage 2 (Pallas): per point tile, a dynamic-length loop over just the
     selected clusters (ids scalar-prefetched to SMEM) runs the same
     running-top-k merge as the exact kernel, but over ~a handful of
     128-vertex cluster tiles instead of all of V.

Contract: EXACT top-k (distances ascending + original vertex indices) for
every point within `thr` of some vertex. Points beyond `thr` get
far-skip semantics (reference-pipeline-exact: such points are sigma-filled
downstream, anim_nerf.py:305): a reported distance that provably exceeds
`thr`, and index 0. This matches the `far_skip` contract of
ops/knn_pallas.py, validated by tests/test_knn_warp.py.

Status: tested but NOT wired into the ops/knn.py dispatcher. On the
volumetric blob rig it loses to the exact kernel (PERF.md: 134 vs 82 ms —
pruning needs tight 2-D surface clusters and patch-coherent queries);
tools/bench_surface.py measures it in its intended regime. Opt in
explicitly by calling knn_two_stage.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_EPS = 1e-4  # conservative bound inflation vs matmul-form distance error

CLUSTER_SIZE = 128  # L: one vertex tile per cluster (8-sublane multiple)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=())
def kd_cluster(verts: jax.Array):
    """(B, V, 3) -> (perm (B, Vp) i32, verts_sorted (B, Vp, 3),
    centroids (B, C, 3), radii (B, C)).

    Equal-size clusters via log2(C) levels of segmented argsort over
    cycling axes. Padded slots carry +BIG coordinates: they sort to the
    tail of every segment and are masked out of the centroid/radius
    statistics (mixed real/pad boundary clusters stay exact); a cluster
    with no real vertex gets a +BIG centroid and never wins stage 1."""
    B, V, _ = verts.shape
    L = CLUSTER_SIZE
    C = _next_pow2(-(-V // L))
    Vp = C * L

    v = jnp.pad(verts.astype(jnp.float32), ((0, 0), (0, Vp - V), (0, 0)),
                constant_values=_BIG)
    perm = jnp.broadcast_to(jnp.arange(Vp, dtype=jnp.int32), (B, Vp))
    levels = int(np.log2(C))
    for level in range(levels):
        S = 2 ** level
        key = jnp.take_along_axis(v[..., level % 3], perm, axis=1)
        key = key.reshape(B, S, Vp // S)
        order = jnp.argsort(key, axis=-1)
        perm = jnp.take_along_axis(perm.reshape(B, S, Vp // S), order,
                                   axis=-1).reshape(B, Vp)

    verts_s = jnp.take_along_axis(v, perm[..., None], axis=1)  # (B, Vp, 3)
    real = (perm < V).reshape(B, C, L)
    vc = verts_s.reshape(B, C, L, 3)
    cnt = jnp.sum(real, axis=-1, keepdims=True)  # (B, C, 1)
    cent = jnp.sum(jnp.where(real[..., None], vc, 0.0), axis=2) \
        / jnp.maximum(cnt, 1)
    cent = jnp.where(cnt > 0, cent, _BIG)  # empty cluster: never selected
    d = jnp.sqrt(jnp.sum((vc - cent[:, :, None]) ** 2, axis=-1))
    radii = jnp.max(jnp.where(real, d, 0.0), axis=-1)  # (B, C)
    return perm, verts_s, cent, radii


def _stage1(points: jax.Array, cent: jax.Array, radii: jax.Array,
            thr: float, tile_n: int, k: int):
    """Cluster selection per point tile. points (B, Np, 3) (already padded
    to a tile_n multiple) -> (ids (B, nT, C) i32 selected-first,
    counts (B, nT) i32, min_lb (B, Np))."""
    B, Np, _ = points.shape
    C = cent.shape[1]
    # matmul-form distance on the MXU; bounds inflated by _EPS to stay
    # conservative against the cancellation error of |p|^2 - 2pc + |c|^2
    p2 = jnp.sum(points * points, axis=-1)
    c2 = jnp.sum(cent * cent, axis=-1)
    cross = jnp.einsum("bnc,bkc->bnk", points, cent,
                       precision=jax.lax.Precision.HIGHEST)
    d = jnp.sqrt(jnp.maximum(p2[..., None] - 2.0 * cross + c2[:, None], 0.0))
    ub = d + radii[:, None] + _EPS
    lb = jnp.maximum(d - radii[:, None] - _EPS, 0.0)

    # k-th smallest ub via k extract-min passes (C is small)
    u = ub
    for _ in range(k - 1):
        m = jnp.min(u, axis=-1, keepdims=True)
        u = jnp.where(u <= m, jnp.inf, u)  # knock out one minimum
    ubk = jnp.min(u, axis=-1)  # (B, Np)

    min_lb = jnp.min(lb, axis=-1)  # (B, Np)
    voting = (min_lb <= thr) if thr > 0 else jnp.ones_like(min_lb,
                                                           dtype=bool)
    need = (lb <= ubk[..., None]) & voting[..., None]  # (B, Np, C)

    nT = Np // tile_n
    cmask = jnp.any(need.reshape(B, nT, tile_n, C), axis=2)  # (B, nT, C)
    counts = jnp.sum(cmask, axis=-1).astype(jnp.int32)
    # stable argsort of (not selected): selected cluster ids first
    ids = jnp.argsort(~cmask, axis=-1, stable=True).astype(jnp.int32)
    return ids, counts, min_lb


def _knn2_kernel(counts_ref, ids_ref, points_ref, verts_ref,
                 out_d_ref, out_i_ref, top_d, top_i, *, k: int, L: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    tile_n = points_ref.shape[-1]
    px = points_ref[0, 0, :].reshape(1, tile_n)
    py = points_ref[0, 1, :].reshape(1, tile_n)
    pz = points_ref[0, 2, :].reshape(1, tile_n)

    top_d[:] = jnp.full((k, tile_n), jnp.inf, dtype=jnp.float32)
    top_i[:] = jnp.zeros((k, tile_n), dtype=jnp.int32)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (k, tile_n), 0)

    def body(t, _):
        c = ids_ref[b, i, t]
        off = c * L
        vx = verts_ref[0, 0, pl.ds(off, L)].reshape(L, 1)
        vy = verts_ref[0, 1, pl.ds(off, L)].reshape(L, 1)
        vz = verts_ref[0, 2, pl.ds(off, L)].reshape(L, 1)
        d2 = (vx - px) ** 2 + (vy - py) ** 2 + (vz - pz) ** 2  # (L, TN)
        col = jax.lax.broadcasted_iota(jnp.int32, (L, tile_n), 0)
        dd = d2
        for _s in range(k):
            m = jnp.min(dd, axis=0, keepdims=True)
            am = jnp.argmin(dd, axis=0).astype(jnp.int32)
            cur_max = jnp.max(top_d[:], axis=0, keepdims=True)
            cur_am = jnp.argmax(top_d[:], axis=0).astype(jnp.int32)
            repl = (slot_iota == cur_am[None, :]) & (m < cur_max)
            top_d[:] = jnp.where(repl, m, top_d[:])
            top_i[:] = jnp.where(repl, (am + off)[None, :], top_i[:])
            dd = jnp.where(col == am[None, :], jnp.inf, dd)
        return 0

    jax.lax.fori_loop(0, counts_ref[b, i], body, 0)

    # ascending compare-swap sort (as the exact kernel)
    def cswap(a, bb):
        da, db = top_d[a, :], top_d[bb, :]
        ia, ib = top_i[a, :], top_i[bb, :]
        swap = da > db
        top_d[a, :] = jnp.where(swap, db, da)
        top_d[bb, :] = jnp.where(swap, da, db)
        top_i[a, :] = jnp.where(swap, ib, ia)
        top_i[bb, :] = jnp.where(swap, ia, ib)

    if k == 4:
        for a, bb in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            cswap(a, bb)
    else:
        for end in range(k - 1, 0, -1):
            for a in range(end):
                cswap(a, a + 1)

    out_d_ref[0] = jnp.sqrt(top_d[:])
    out_i_ref[0] = top_i[:]


@partial(jax.jit, static_argnames=("k", "thr", "tile_n", "interpret"))
def knn_two_stage(points: jax.Array, verts: jax.Array, k: int = 4,
                  thr: float = 0.2, tile_n: int = 2048,
                  interpret: bool = False):
    """Two-stage kNN; same output contract as knn_pallas(far_skip=thr):
    exact (dists ascending, original-order indices) for points within
    `thr` of a vertex, conservative bound + index 0 beyond."""
    B, N, _ = points.shape
    V = verts.shape[1]
    points = jax.lax.stop_gradient(points)
    verts = jax.lax.stop_gradient(verts)

    perm, verts_s, cent, radii = kd_cluster(verts)
    C = cent.shape[1]
    L = CLUSTER_SIZE
    Vp = C * L

    pad_n = (-N) % tile_n
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    ids, counts, min_lb = _stage1(pts, cent, radii, thr, tile_n, k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 3, Vp), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k, tile_n), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, k, tile_n), lambda b, i, *_: (b, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, tile_n), jnp.float32),
            pltpu.VMEM((k, tile_n), jnp.int32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        partial(_knn2_kernel, k=k, L=L),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, k, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, k, Np), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * B * Np * 8 * L, bytes_accessed=B * (Np + Vp) * 12,
            transcendentals=0),
        interpret=interpret,
    )(counts, ids, pts.transpose(0, 2, 1), verts_s.transpose(0, 2, 1))

    d = out_d.transpose(0, 2, 1)[:, :N]     # (B, N, k)
    i_sorted = out_i.transpose(0, 2, 1)[:, :N]
    # sorted positions -> original vertex indices
    i_orig = jnp.take_along_axis(
        perm, i_sorted.reshape(B, -1), axis=1).reshape(B, N, k)

    # Far points: the documented contract is a reported distance > thr and
    # index 0 on EVERY lane. Two cases: (a) no cluster swept (top_d == inf
    # — alone in its tile): report the conservative min_lb bound; (b) swept
    # anyway because voting points share its tile: the partial sweep
    # returns finite distances (possibly to boundary-cluster PAD slots,
    # i_sorted >= V). Both are detected per POINT by nearest-reported
    # distance > thr — a true distance to some vertex is >= the true
    # minimum, and within-thr points are exact (their clusters all voted),
    # so their nearest is <= thr.
    if thr > 0:
        bound = jnp.maximum(min_lb[:, :N, None], thr * 1.0001)
        d = jnp.where(~jnp.isfinite(d), bound, d)
        far_pt = d[..., 0:1] > thr
        d = jnp.where(far_pt, jnp.maximum(d, thr * 1.0001), d)
        i_orig = jnp.where(far_pt, 0, i_orig)
    return jax.lax.stop_gradient(d), i_orig
