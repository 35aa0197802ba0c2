"""Fused Pallas TPU kernel for k-nearest-neighbour against the SMPL verts.

The jnp path (ops/knn.py) materialises (chunk x V) distance matrices in HBM
and runs lax.top_k over V — measured at ~13 s/step on a v5e for the
male-3-casual workload (the reference needed an external CUDA extension for
the same reason, anim_nerf.py:81-84). This kernel keeps everything on-chip:

  * the full vertex cloud lives in VMEM, transposed to (3, V) so vertex
    coordinates stream along lanes (V=6890 -> 84 KB);
  * each grid step owns a (TILE_N) slab of query points; an inner loop walks
    (TILE_V) vertex tiles computing squared distances directly as
    (v - p)^2 sums on the VPU — no cancellation-prone |p|^2 - 2pv + |v|^2,
    no HBM spill;
  * a running top-k (k x TILE_N scratch, k native sublanes) is maintained
    with k extract-min passes per tile + replace-the-current-max merging;
  * a fixed compare-swap network sorts the k winners ascending at the end
    (neighbour 0 must be the nearest: the confidence gate compares every
    neighbour's LBS weights against neighbour 0's, anim_nerf.py:166-168).

Distances are returned stop-gradient (matching the reference's no_grad kNN).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9  # padding coordinate: d2 ~ 1e18, always loses


def _knn_kernel(points_ref, verts_ref, vbox_ref, out_d_ref, out_i_ref,
                top_d, top_i, *, k: int, tile_v: int, n_vert_tiles: int,
                cull: bool, far2: float):
    """Grid: (B, N/TILE_N). points (1, 3, TILE_N); verts (1, 3, Vp);
    vbox (1, n_vt, 8) per-vertex-tile AABBs (xyz min | xyz max | pad).

    With `cull`, a vertex tile is skipped when the squared distance between
    its AABB and the point tile's AABB provably exceeds every point's
    current 4th-best — exact, since skipping can then never change the
    result. Ray samples are spatially coherent (consecutive samples of
    neighbouring rays), so background-ray tiles skip most of the body.

    With `far2 > 0` (= dis_threshold^2), a point tile whose every point is
    provably farther than dis_threshold from ALL vertices skips the whole
    sweep: those points are invalid downstream (sigma filled with -1e5,
    anim_nerf.py:305) so their exact neighbours are irrelevant — the kernel
    returns the per-point lower bound (> dis_threshold) and index 0, and the
    rendered output (values AND gradients) is bit-equivalent. Most rays of a
    real frame are background, so this is the big win for full-frame
    rendering."""
    tile_n = points_ref.shape[-1]
    px = points_ref[0, 0, :].reshape(1, tile_n)
    py = points_ref[0, 1, :].reshape(1, tile_n)
    pz = points_ref[0, 2, :].reshape(1, tile_n)

    top_d[:] = jnp.full((k, tile_n), jnp.inf, dtype=jnp.float32)
    top_i[:] = jnp.zeros((k, tile_n), dtype=jnp.int32)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (k, tile_n), 0)

    if cull:
        p_lo = (jnp.min(px), jnp.min(py), jnp.min(pz))
        p_hi = (jnp.max(px), jnp.max(py), jnp.max(pz))

    if far2 > 0:
        # per-point lower bound on the distance to EVERY vertex: min over
        # vertex tiles of the point-to-AABB distance (a dozen VPU ops/tile)
        g_lb2 = jnp.full((1, tile_n), jnp.inf, dtype=jnp.float32)
        for t in range(n_vert_tiles):
            lb2 = jnp.zeros((1, tile_n), dtype=jnp.float32)
            for d, p in enumerate((px, py, pz)):
                gap = jnp.maximum(
                    jnp.maximum(vbox_ref[0, t, d] - p,
                                p - vbox_ref[0, t, 3 + d]), 0.0)
                lb2 = lb2 + gap * gap
            g_lb2 = jnp.minimum(g_lb2, lb2)
        all_far = jnp.min(g_lb2) > far2

    def tile_body(t):
        off = t * tile_v
        vx = verts_ref[0, 0, pl.ds(off, tile_v)].reshape(tile_v, 1)
        vy = verts_ref[0, 1, pl.ds(off, tile_v)].reshape(tile_v, 1)
        vz = verts_ref[0, 2, pl.ds(off, tile_v)].reshape(tile_v, 1)
        d2 = (vx - px) ** 2 + (vy - py) ** 2 + (vz - pz) ** 2  # (TV, TN)

        col = jax.lax.broadcasted_iota(jnp.int32, (tile_v, tile_n), 0)
        for _s in range(k):
            m = jnp.min(d2, axis=0, keepdims=True)            # (1, TN)
            am = jnp.argmin(d2, axis=0).astype(jnp.int32)     # (TN,)
            # merge into running top-k: replace the current worst if better
            cur_max = jnp.max(top_d[:], axis=0, keepdims=True)  # (1, TN)
            cur_am = jnp.argmax(top_d[:], axis=0).astype(jnp.int32)
            repl = (slot_iota == cur_am[None, :]) & (m < cur_max)
            top_d[:] = jnp.where(repl, m, top_d[:])
            top_i[:] = jnp.where(repl, (am + off)[None, :], top_i[:])
            # knock the extracted minimum out of this tile
            d2 = jnp.where(col == am[None, :], jnp.inf, d2)

    def process_tile(t, _):
        if not cull:
            tile_body(t)
            return 0

        # AABB-to-AABB squared distance lower bound
        lb2 = jnp.float32(0.0)
        for d in range(3):
            gap = jnp.maximum(
                jnp.maximum(p_lo[d] - vbox_ref[0, t, 3 + d], 0.0),
                jnp.maximum(vbox_ref[0, t, d] - p_hi[d], 0.0))
            lb2 = lb2 + gap * gap
        worst = jnp.max(top_d[:])  # inf until every slot is real (tile 0)

        @pl.when(lb2 <= worst)
        def _():
            tile_body(t)

        return 0

    def full_sweep():
        jax.lax.fori_loop(0, n_vert_tiles, process_tile, 0)

    if far2 > 0:
        @pl.when(all_far)
        def _():
            # every point provably beyond dis_threshold: report the bound
            top_d[:] = jnp.broadcast_to(g_lb2, (k, tile_n))
            # top_i stays 0

        @pl.when(jnp.logical_not(all_far))
        def _():
            full_sweep()
    else:
        full_sweep()

    # ascending sort of the k winners (compare-swap network rows)
    def cswap(a, b):
        da, db = top_d[a, :], top_d[b, :]
        ia, ib = top_i[a, :], top_i[b, :]
        swap = da > db
        top_d[a, :] = jnp.where(swap, db, da)
        top_d[b, :] = jnp.where(swap, da, db)
        top_i[a, :] = jnp.where(swap, ib, ia)
        top_i[b, :] = jnp.where(swap, ia, ib)

    if k == 4:
        for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            cswap(a, b)
    else:  # bubble network for arbitrary small k
        for end in range(k - 1, 0, -1):
            for a in range(end):
                cswap(a, a + 1)

    out_d_ref[0] = jnp.sqrt(top_d[:])
    out_i_ref[0] = top_i[:]


def _packed_knn_kernel(points_ref, verts_ref, vbox_ref, out_d_ref, out_i_ref,
                       top_k, *, k: int, tile_v: int, n_vert_tiles: int,
                       far2: float):
    """Packed-key top-k extract (the default training kernel).

    Key = (f32 bits of d2 & ~0x1FFF) | global vertex index, as int32: d2 is
    non-negative, so its f32 bit pattern is order-preserving as a signed
    int, and V padded <= 8192 fits the 13 freed mantissa bits. One integer
    min per extract pass replaces _knn_kernel's min+argmin+iota-knockout
    (keys are unique per vertex, so value-equality knockout removes exactly
    one candidate per lane), and the running top-k is kept ascending by a
    3-stage bubble insert — no argmax (Mosaic argmax is f32-only), no final
    sort network. Measured 80.5 -> 67.1 ms on the flagship training shapes
    (tools/bench_knn.py).

    d2 itself uses the 4-op dot form |v|^2 - 2 p.v + |p|^2 (three FMAs with
    the per-vertex [-2v | |v|^2] rows precomputed per tile, one broadcast
    add of the per-point |p|^2 row) instead of the 9-op (v-p)^2 form — the
    d2 sweep is the kernel's dominant cost at V=6890, and this is the
    classic way to buy it back with FMA throughput.

    Cost (both deliberate, both bounded): distances are quantized — 13 low
    mantissa bits dropped, <= 2^-10 relative on d2 (<= ~5e-4 relative on d)
    — and the dot form adds a cancellation term of a few ulps of
    (|p| + |v|)^2 (absolute ~1e-6 on d2 for the unit-scale bodies this
    serves, i.e. below the quantization except for near-coincident points).
    Winners are exact under that perturbed-then-quantized ordering: a pair
    of vertices whose d2 differ by less than one quantum can swap ranks vs
    the exact kernel (ties break toward the smaller vertex index).
    Downstream the distances only feed exp(-d) blend weights and the
    dis_threshold validity test (models/warp.py), where a ~6e-4 relative
    perturbation is far below the training signal; the exact kernel
    (_knn_kernel) remains available via packed=False for bit-parity work.
    far2 as in _knn_kernel."""
    tile_n = points_ref.shape[-1]
    px = points_ref[0, 0, :].reshape(1, tile_n)
    py = points_ref[0, 1, :].reshape(1, tile_n)
    pz = points_ref[0, 2, :].reshape(1, tile_n)
    pp = px * px + py * py + pz * pz  # (1, TN) per-point |p|^2

    BIGKEY = jnp.int32(0x7FFFFFFF)
    MASK = jnp.int32(~0x1FFF)
    top_k[:] = jnp.full((k, tile_n), BIGKEY, dtype=jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_v, tile_n), 0)

    if far2 > 0:
        g_lb2 = jnp.full((1, tile_n), jnp.inf, dtype=jnp.float32)
        for t in range(n_vert_tiles):
            lb2 = jnp.zeros((1, tile_n), dtype=jnp.float32)
            for d, p in enumerate((px, py, pz)):
                gap = jnp.maximum(
                    jnp.maximum(vbox_ref[0, t, d] - p,
                                p - vbox_ref[0, t, 3 + d]), 0.0)
                lb2 = lb2 + gap * gap
            g_lb2 = jnp.minimum(g_lb2, lb2)
        all_far = jnp.min(g_lb2) > far2

    def tile_body(t, _):
        off = t * tile_v
        vx = verts_ref[0, 0, pl.ds(off, tile_v)].reshape(tile_v, 1)
        vy = verts_ref[0, 1, pl.ds(off, tile_v)].reshape(tile_v, 1)
        vz = verts_ref[0, 2, pl.ds(off, tile_v)].reshape(tile_v, 1)
        # dot form: per-vertex rows cost O(TV); the (TV, TN) sweep is a
        # 3-FMA chain + max per pair (vs sub/mul/add x3 for (v-p)^2).
        # Clamp at 0: cancellation can go epsilon-negative for
        # near-coincident points, and a negative f32's bit pattern would
        # order WRONG (reversed) as a signed-int key.
        m2x, m2y, m2z = -(vx + vx), -(vy + vy), -(vz + vz)
        vq = vx * vx + vy * vy + vz * vz  # (TV, 1): |v|^2
        d2 = jnp.maximum(
            pp + (m2z * pz + (m2y * py + (m2x * px + vq))), 0.0)
        key = (jax.lax.bitcast_convert_type(d2, jnp.int32) & MASK) | (col + off)
        for _s in range(k):
            m = jnp.min(key, axis=0, keepdims=True)            # (1, TN)
            key = jnp.where(key == m, BIGKEY, key)
            top_k[k - 1, :] = jnp.minimum(top_k[k - 1, :], m[0])
            for a in range(k - 2, -1, -1):
                ka, kb = top_k[a, :], top_k[a + 1, :]
                top_k[a, :] = jnp.minimum(ka, kb)
                top_k[a + 1, :] = jnp.maximum(ka, kb)
        return 0

    def full_sweep():
        jax.lax.fori_loop(0, n_vert_tiles, tile_body, 0)

    if far2 > 0:
        @pl.when(all_far)
        def _():
            # report the conservative bound with index 0 on every lane;
            # round the quantized bound UP one quantum so it stays > far2
            # (plain masking rounds down and could cross the threshold)
            lb_key = ((jax.lax.bitcast_convert_type(g_lb2, jnp.int32) & MASK)
                      + jnp.int32(0x2000)) & MASK
            top_k[:] = jnp.broadcast_to(lb_key, (k, tile_n))

        @pl.when(jnp.logical_not(all_far))
        def _():
            full_sweep()
    else:
        full_sweep()

    keys = top_k[:]
    d2q = jax.lax.bitcast_convert_type(keys & MASK, jnp.float32)
    out_d_ref[0] = jnp.sqrt(d2q)
    out_i_ref[0] = keys & jnp.int32(0x1FFF)


def _tournament_knn_kernel(points_ref, verts_ref, vbox_ref, out_d_ref,
                           out_i_ref, top_k, score_ref=None, order_ref=None,
                           *, tile_v: int, n_vert_tiles: int, far2: float,
                           tile_skip: bool = False):
    """Packed-key top-4 via a bitonic tournament (k=4 only).

    Same packed int32 keys as _packed_knn_kernel (d2 f32 bits & ~0x1FFF |
    vertex index — see its docstring for the quantization contract), but
    the extraction replaces the 4 extract-min sweeps (each a full-tile min
    reduction PLUS a full-tile equality knockout, ~3 row-ops per vertex row
    per pass, 12 total) with a single merge tree, ~6 row-ops per vertex row:

      * slice the (TV, TN) keys into 4 row groups; each (row, lane)
        position now holds 4 candidate keys, sorted ascending by a
        5-exchange network (10 min/max ops on (TV/4, TN) arrays);
      * merge positions pairwise down the rows: for sorted 4-vectors a, b
        the 4 smallest of a ∪ b are exactly min(a_i, b_{3-i}) (bitonic),
        resorted by the 2-stage network ce(0,2),(1,3),(0,1),(2,3) — 12
        min/max ops per level on halving shapes;
      * below 8 sublanes, static slices stop being tile-aligned, so the
        last 3 levels pair row r with row r+h via pltpu.roll(-h): every
        row r computes min(a_i[r], b_{3-i}[(r+h) % 8]), which for ANY r is
        a valid merge of the pair {r, (r+h) % 8} (the min-with-reversed
        trick is symmetric in a and b), so after h = 4, 2, 1 every row —
        row 0 included — holds the tile's true top-4;
      * one last bitonic merge folds the tile's 4-vector into the running
        top_k scratch.

    Winners are bit-identical to _packed_knn_kernel: keys are distinct
    (index bits), and the top-4 of a set of distinct keys does not depend
    on the comparison order. Measured 65.9 ms vs 70.9 ms extract-min on
    the tools/bench_knn.py rig (v5e) — see PERF.md round 5.
    far2 as in _knn_kernel.

    With `tile_skip`, a vertex tile is skipped when its deflated
    per-point distance lower bound (point-to-tile-AABB, shrunk by 2^-8
    relative + 1e-4 absolute to dominate the dot-form cancellation and
    key quantization) exceeds EVERY lane's current 4th-best key. Skipping
    is provably output-identical: any vertex v in tile t has
    d2(v) >= lb2(t) >= lb2_safe(t), so key(v) >= lb_key(t) > kth implies
    v can never enter the running top-4 (and kth only shrinks later). To
    make the bound bite early, the tile with the smallest summed lb2 is
    processed FIRST (a dynamic 512-aligned lane slice); effectiveness
    requires spatially coherent point tiles — the rows-compact trainer
    Morton-sorts survivors for exactly this (ops/perm_sort.py). Selectivity
    measured on the flagship surface rig: see PERF.md round 5."""
    tile_n = points_ref.shape[-1]
    px = points_ref[0, 0, :].reshape(1, tile_n)
    py = points_ref[0, 1, :].reshape(1, tile_n)
    pz = points_ref[0, 2, :].reshape(1, tile_n)
    pp = px * px + py * py + pz * pz

    BIGKEY = jnp.int32(0x7FFFFFFF)
    MASK = jnp.int32(~0x1FFF)
    top_k[:] = jnp.full((4, tile_n), BIGKEY, dtype=jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_v, tile_n), 0)

    def tile_lb2(t):
        """Per-lane squared-distance lower bound to vertex tile t's AABB.
        t may be traced: vbox lives in SMEM (scalar reads)."""
        lb2 = jnp.zeros((1, tile_n), dtype=jnp.float32)
        for d, p in enumerate((px, py, pz)):
            gap = jnp.maximum(
                jnp.maximum(vbox_ref[0, t, d] - p,
                            p - vbox_ref[0, t, 3 + d]), 0.0)
            lb2 = lb2 + gap * gap
        return lb2

    if far2 > 0 or tile_skip:
        g_lb2 = jnp.full((1, tile_n), jnp.inf, dtype=jnp.float32)
        for t in range(n_vert_tiles):
            lb2 = tile_lb2(t)
            g_lb2 = jnp.minimum(g_lb2, lb2)
            if tile_skip:
                # scores/order live in SMEM so the sweep can index them
                # with a traced rank (scalar loads/stores only)
                score_ref[t] = jnp.sum(lb2)
        all_far = jnp.min(g_lb2) > far2 if far2 > 0 else False

    if tile_skip:
        # ascending-score visit order (selection sort over <=64 scalars):
        # visiting near tiles first makes every lane's 4th-best bound
        # final-tight after a couple of tiles, so far tiles actually skip
        for i in range(n_vert_tiles):
            best_t = jnp.int32(0)
            best_s = jnp.float32(jnp.inf)
            for t in range(n_vert_tiles):
                s = score_ref[t]
                best_t = jnp.where(s < best_s, jnp.int32(t), best_t)
                best_s = jnp.minimum(s, best_s)
            order_ref[i] = best_t
            score_ref[best_t] = jnp.float32(jnp.inf)

    def resort_bitonic(v):
        # sorted(a) x sorted(b) -> min(a_i, b_{3-i}) is bitonic; 2 stages
        for a, b in ((0, 2), (1, 3), (0, 1), (2, 3)):
            lo = jnp.minimum(v[a], v[b])
            hi = jnp.maximum(v[a], v[b])
            v[a], v[b] = lo, hi
        return v

    def tile_body(t, _):
        off = t * tile_v
        vx = verts_ref[0, 0, pl.ds(off, tile_v)].reshape(tile_v, 1)
        vy = verts_ref[0, 1, pl.ds(off, tile_v)].reshape(tile_v, 1)
        vz = verts_ref[0, 2, pl.ds(off, tile_v)].reshape(tile_v, 1)
        m2x, m2y, m2z = -(vx + vx), -(vy + vy), -(vz + vz)
        vq = vx * vx + vy * vy + vz * vz
        d2 = jnp.maximum(
            pp + (m2z * pz + (m2y * py + (m2x * px + vq))), 0.0)
        key = (jax.lax.bitcast_convert_type(d2, jnp.int32) & MASK) | (col + off)

        g = tile_v // 4
        v = [jax.lax.slice_in_dim(key, i * g, (i + 1) * g, axis=0)
             for i in range(4)]
        # sort each position's 4-vector (5-exchange network)
        for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            lo = jnp.minimum(v[a], v[b])
            hi = jnp.maximum(v[a], v[b])
            v[a], v[b] = lo, hi
        # merge tree on aligned slices down to 8 sublanes
        while g > 8:
            h = g // 2
            a = [jax.lax.slice_in_dim(v[i], 0, h, axis=0) for i in range(4)]
            b = [jax.lax.slice_in_dim(v[i], h, g, axis=0) for i in range(4)]
            v = resort_bitonic([jnp.minimum(a[i], b[3 - i])
                                for i in range(4)])
            g = h
        # last 3 levels inside the (8, TN) tile via sublane rotation
        h = 4
        while h >= 1:
            # roll takes non-negative shifts; rotating rows by 8-h pairs
            # row r with row (r+h) % 8, which is what the merge wants
            w = [pltpu.roll(v[3 - i], 8 - h, axis=0) for i in range(4)]
            v = resort_bitonic([jnp.minimum(v[i], w[i]) for i in range(4)])
            h //= 2
        # fold the tile's top-4 (row 0 of each) into the running scratch
        tk = [top_k[i, :] for i in range(4)]
        cand = [v[3 - i][0, :] for i in range(4)]
        tk = resort_bitonic([jnp.minimum(tk[i], cand[i]) for i in range(4)])
        for i in range(4):
            top_k[i, :] = tk[i]
        return 0

    def full_sweep():
        if not tile_skip:
            jax.lax.fori_loop(0, n_vert_tiles, tile_body, 0)
            return

        # nearest tile first — unconditionally — so every lane's 4th-best
        # bound is tight before the first skip test runs
        tile_body(order_ref[0], 0)

        def sweep_body(i, _):
            t = order_ref[i]
            lb2s = jnp.maximum(tile_lb2(t) * (1.0 - 2.0 ** -8) - 1e-4, 0.0)
            lb_key = jax.lax.bitcast_convert_type(lb2s, jnp.int32) & MASK
            kth = top_k[3, :].reshape(1, tile_n)
            # process unless EVERY lane's bound already exceeds its 4th best
            needed = jnp.min(lb_key - kth) <= 0

            @pl.when(needed)
            def _():
                tile_body(t, 0)

            return 0

        jax.lax.fori_loop(1, n_vert_tiles, sweep_body, 0)

    if far2 > 0:
        @pl.when(all_far)
        def _():
            lb_key = ((jax.lax.bitcast_convert_type(g_lb2, jnp.int32) & MASK)
                      + jnp.int32(0x2000)) & MASK
            top_k[:] = jnp.broadcast_to(lb_key, (4, tile_n))

        @pl.when(jnp.logical_not(all_far))
        def _():
            full_sweep()
    else:
        full_sweep()

    keys = top_k[:]
    d2q = jax.lax.bitcast_convert_type(keys & MASK, jnp.float32)
    out_d_ref[0] = jnp.sqrt(d2q)
    out_i_ref[0] = keys & jnp.int32(0x1FFF)


def _min_dist_kernel(points_ref, verts_ref, out_ref, *, tile_v: int,
                     n_vert_tiles: int):
    """Nearest-vertex distance only — no top-k bookkeeping, no argmin: one
    running min over vertex tiles. ~4x cheaper than the k=4 kernel (the k
    extract-min passes dominate it); used as the validity pre-pass for
    sample-level compaction (points with min-dist >= dis_threshold are
    provably invalid downstream: the blended kNN distance is a convex
    combination of the k neighbour distances, all >= the minimum)."""
    tile_n = points_ref.shape[-1]
    px = points_ref[0, 0, :].reshape(1, tile_n)
    py = points_ref[0, 1, :].reshape(1, tile_n)
    pz = points_ref[0, 2, :].reshape(1, tile_n)

    best = jnp.full((1, tile_n), jnp.inf, dtype=jnp.float32)
    for t in range(n_vert_tiles):
        off = t * tile_v
        vx = verts_ref[0, 0, pl.ds(off, tile_v)].reshape(tile_v, 1)
        vy = verts_ref[0, 1, pl.ds(off, tile_v)].reshape(tile_v, 1)
        vz = verts_ref[0, 2, pl.ds(off, tile_v)].reshape(tile_v, 1)
        d2 = (vx - px) ** 2 + (vy - py) ** 2 + (vz - pz) ** 2
        best = jnp.minimum(best, jnp.min(d2, axis=0, keepdims=True))
    # broadcast to 8 sublanes: a 1-sublane block is not a legal block shape
    # and a size-1 output dim gets the degenerate T(1,128) layout that XLA
    # stack-allocates in scoped vmem (see min_dist_pallas)
    out_ref[0] = jnp.broadcast_to(jnp.sqrt(best), out_ref.shape[1:])


@partial(jax.jit, static_argnames=("tile_n", "tile_v", "interpret"))
def min_dist_pallas(points: jax.Array, verts: jax.Array,
                    tile_n: int = 1024, tile_v: int = 512,
                    interpret: bool = False) -> jax.Array:
    """(B, N, 3), (B, V, 3) -> (B, N) exact nearest-vertex distance.

    tile_n x tile_v is capped so the kernel's unrolled (tile_v, tile_n)
    distance intermediates fit the 16M VMEM stack (tile_n=2048 overflowed
    it: ~29M of concurrent d2 temporaries). The output is (B, 8, Np) — the
    best row broadcast across 8 sublanes, row 0 sliced outside — because a
    1-sublane block is not a legal block shape, a size-1 output dim gets a
    degenerate T(1,128) layout, and the 8x write amplification is noise
    next to the O(N*V) compute."""
    B, N, _ = points.shape
    V = verts.shape[1]
    pad_n = (-N) % tile_n
    pad_v = (-V) % tile_v
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 0)))
    vts = jnp.pad(verts.astype(jnp.float32), ((0, 0), (0, pad_v), (0, 0)),
                  constant_values=_BIG)
    Np, Vp = N + pad_n, V + pad_v
    out = pl.pallas_call(
        partial(_min_dist_kernel, tile_v=tile_v, n_vert_tiles=Vp // tile_v),
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Vp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile_n), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=9 * B * Np * Vp, bytes_accessed=B * (Np + Vp) * 12,
            transcendentals=0),
        interpret=interpret,
    )(pts.transpose(0, 2, 1), vts.transpose(0, 2, 1))
    return out[:, 0, :N]


@partial(jax.jit,
         static_argnames=("k", "tile_n", "tile_v", "interpret", "cull",
                          "far_skip", "packed", "transposed_out",
                          "points_t_in", "tournament", "tile_skip"))
def knn_pallas(points: jax.Array, verts: jax.Array, k: int = 4,
               tile_n: int = 1024, tile_v: int = 512,
               interpret: bool = False, cull: bool = False,
               far_skip: float = 0.0, packed: bool = False,
               transposed_out: bool = False, points_t_in: bool = False,
               tournament: bool = True, tile_skip: bool = False):
    """Exact kNN, same contract as ops.knn.knn: (B,N,3),(B,N,k) ->
    dists (B,N,k) ascending + idx (B,N,k). `cull` enables the exact
    AABB tile-skip; `far_skip` (= dis_threshold) enables the pipeline-exact
    all-far tile skip — returned distances for skipped points are true
    distances to vertex 0 (all > far_skip), indices are 0 (see
    _knn_kernel). `packed` selects the faster packed-key kernel (distances
    quantized: 13 low mantissa bits dropped, <= 2^-10 relative on d2; winners exact under quantized ordering —
    see _packed_knn_kernel; incompatible with `cull`). With `tournament`
    (default) a packed call with k=4 and a power-of-two tile_v >= 32 takes
    the bitonic merge-tree kernel instead of the extract-min kernel —
    bit-identical winners, ~7% faster (see _tournament_knn_kernel).
    `tile_skip` (tournament path only) additionally skips vertex tiles
    whose conservative distance lower bound exceeds every lane's current
    4th-best — output-identical by construction; pays only when the point
    tiles are spatially coherent (Morton-sorted survivors)."""
    if points_t_in:  # (B, 3, N) rows — the fused pipeline's native form
        B, _, N = points.shape
    else:
        B, N, _ = points.shape
    V = verts.shape[1]
    if packed and V + ((-V) % tile_v) > 8192:
        # the packed key's vertex-index field is 13 bits (<= 8192 padded
        # vertices — covers SMPL/SMPL-H/MANO/FLAME); larger clouds such as
        # SMPL-X (V=10475) silently take the unpacked kernel instead
        packed = False
    if packed:
        assert not cull, "packed kernel does not implement the AABB cull"

    # The kNN itself is non-differentiable (reference runs it under no_grad,
    # anim_nerf.py:157-159); block tangents before the kernel so autodiff
    # never tries to JVP through pallas_call.
    points = jax.lax.stop_gradient(points)
    verts = jax.lax.stop_gradient(verts)

    pad_n = (-N) % tile_n
    pad_v = (-V) % tile_v
    if points_t_in:
        pts_t = jnp.pad(points.astype(jnp.float32),
                        ((0, 0), (0, 0), (0, pad_n)))
    else:
        pts = jnp.pad(points.astype(jnp.float32),
                      ((0, 0), (0, pad_n), (0, 0)))
        pts_t = pts.transpose(0, 2, 1)  # (B, 3, Np)
    vts = jnp.pad(verts.astype(jnp.float32), ((0, 0), (0, pad_v), (0, 0)),
                  constant_values=_BIG)
    Np, Vp = N + pad_n, V + pad_v

    vts_t = vts.transpose(0, 2, 1)  # (B, 3, Vp)

    # per-vertex-tile AABBs for the cull / far-skip bounds. Padded lanes are
    # masked out of BOTH extrema: folding the +BIG padding into the box max
    # (as a previous revision did) inflates the last tile's box to 1e9, so
    # any point on the positive side of the cloud got a zero lower bound
    # from that tile and the far-skip/cull never fired (V=6890 always pads).
    n_vt = Vp // tile_v
    vt = vts.reshape(B, n_vt, tile_v, 3)
    real = (jnp.arange(Vp) < V).reshape(1, n_vt, tile_v, 1)
    vbox = jnp.concatenate(
        [jnp.where(real, vt, jnp.inf).min(axis=2),
         jnp.where(real, vt, -jnp.inf).max(axis=2),
         jnp.zeros((B, n_vt, 2), jnp.float32)], axis=-1)  # (B, n_vt, 8)

    if packed:
        use_tournament = (tournament and k == 4 and tile_v >= 32
                          and tile_v & (tile_v - 1) == 0)
        use_tile_skip = tile_skip and tile_v >= 128  # Mosaic: dynamic lane
        # slices must be provable 128-multiples (the bootstrap tile slice)
        if use_tournament:
            kernel = partial(_tournament_knn_kernel, tile_v=tile_v,
                             n_vert_tiles=n_vt, far2=float(far_skip) ** 2,
                             tile_skip=use_tile_skip)
        else:
            kernel = partial(_packed_knn_kernel, k=k, tile_v=tile_v,
                             n_vert_tiles=n_vt, far2=float(far_skip) ** 2)
        scratch = [pltpu.VMEM((k, tile_n), jnp.int32)]
        if use_tournament and use_tile_skip:
            scratch += [pltpu.SMEM((n_vt,), jnp.float32),
                        pltpu.SMEM((n_vt,), jnp.int32)]
    else:
        kernel = partial(_knn_kernel, k=k, tile_v=tile_v,
                         n_vert_tiles=n_vt, cull=cull,
                         far2=float(far_skip) ** 2)
        scratch = [pltpu.VMEM((k, tile_n), jnp.float32),
                   pltpu.VMEM((k, tile_n), jnp.int32)]
    grid = (B, Np // tile_n)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Vp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # SMEM: only ever read as scalars, and the tile-skip sweep
            # indexes it with a traced tile id (dynamic scalar reads are
            # an SMEM capability, not a VMEM one)
            pl.BlockSpec((1, n_vt, 8), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
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
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=9 * B * Np * Vp, bytes_accessed=B * (Np + Vp) * 12,
            transcendentals=0),
        interpret=interpret,
    )(pts_t, vts_t, vbox)

    if transposed_out:
        # kernel-native (B, k, N) — what the fused warp-blend consumes;
        # skips two (B, N, k) retiling transposes
        return jax.lax.stop_gradient(out_d[:, :, :N]), out_i[:, :, :N]
    d = jax.lax.stop_gradient(out_d.transpose(0, 2, 1)[:, :N])
    i = out_i.transpose(0, 2, 1)[:, :N]
    return d, i
