"""Batched full-frame inference shared by the CLIs.

Equivalent of the reference's `batched_inference` helpers
(novel_view.py:78-116, novel_pose.py:43-80, extract_mesh.py:49-61), minus
the chunk loop: frames render as ONE jitted program with the ray axis
sharded over the mesh (SURVEY.md §2.8). Supports the turntable rotation P
applied to root-frame rays and template/shape-edited bodies.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from animnerf_tpu.models.warp import prepare_frame, rays_to_root_frame
from animnerf_tpu.training.system import AnimNeRFSystem


def turntable_rotation(i: int, n_views: int, angle_deg: float = 0.0) -> np.ndarray:
    """View-i rotation: R_y(2*pi*i/N) @ R_x(-angle) (reference
    novel_view.py:193-198 — its `R_z` is actually a rotation about x)."""
    ax = -math.radians(angle_deg)
    ca, sa = math.cos(ax), math.sin(ax)
    R_x = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], np.float32)
    ay = 2.0 * math.pi * i / n_views
    cy, sy = math.cos(ay), math.sin(ay)
    R_y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = R_y @ R_x
    return P


def _pad_ray_ids(maybe: np.ndarray, active: np.ndarray,
                 pad: int) -> np.ndarray:
    """`pad` ray indices for shape-quantum padding of the culled active
    set. Padded slots' outputs are discarded, so any valid index is exact;
    INACTIVE rays are free (zero in-shell samples -> no kNN/MLP survivors),
    whereas duplicating an active (body-hitting) ray pays its full warp +
    field cost `pad` times over."""
    if pad == 0:
        return active[:0]
    inactive = np.nonzero(~maybe)[0]
    if len(inactive) == 0:  # body fills the frame: fall back to active rays
        return np.repeat(active[-1:], pad)
    return np.resize(inactive, pad)


class Renderer:
    """Caches the jitted render program across frames/views."""

    def __init__(self, system: AnimNeRFSystem, mesh=None):
        self.system = system
        self.mesh = mesh
        self._render = jax.jit(self._render_fn, static_argnames=())
        self._maybe_hit = jax.jit(self._maybe_hit_fn)
        # prepass/prepass_boxes are STATIC jit args: toggling them on a live
        # Renderer must recompile, not silently reuse a program traced with
        # the old pre-pass mode (whose survivor counts it would keep
        # reporting) — ADVICE r3 item 1
        self._fused = jax.jit(
            self._fused_fn,
            static_argnames=("cap_c", "cap_f", "prepass", "prepass_boxes"))
        self._caps: dict = {}  # ray count -> (cap_c, cap_f) rungs

    def _render_fn(self, params, body_params, body_tmpl, rays, P):
        ctx = prepare_frame(self.system.body_model, body_params, body_tmpl)
        rays_root = rays_to_root_frame(ctx, rays)
        # rotate rays about the body in the root frame (novel_view.py:91-92)
        o = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 0:3]) + P[:3, 3]
        d = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 3:6])
        rays_root = jnp.concatenate([o, d, rays_root[..., 6:8]], axis=-1)

        scene = self.system.scene

        if self.system.rows_renderable() \
                and self.system.scene_cfg.deformation_dim == 0 \
                and self.system.scene_cfg.apperance_dim == 0:
            from animnerf_tpu.render.volume_renderer import render_rays_rows

            return render_rays_rows(
                self.system.renderer_cfg,
                lambda xyz_t: scene.warp_rows(ctx, xyz_t),
                lambda rows, fine: scene.field_rows(params["anim_nerf"],
                                                    rows, fine),
                rays_root, perturb=0.0)

        def warp_fn(xyz, viewdir):
            return scene.warp_points(ctx, xyz, viewdir)

        def field_fn(xyz, viewdir, valid, use_fine):
            return scene.field_points(params["anim_nerf"], xyz, viewdir,
                                      valid, use_fine)

        from animnerf_tpu.render.volume_renderer import render_rays_split

        return render_rays_split(self.system.renderer_cfg, warp_fn, field_fn,
                                 rays_root, perturb=0.0)

    # Per-slab ray cap for single-device rendering: 32k rays x 96 samples
    # of warp/MLP tensors fit 16G HBM with headroom (64k measured 1G over).
    # Sharded multi-chip rendering splits across chips instead, and a whole
    # 512^2 frame is just 8 slabs here (vs the reference's 128 chunks of
    # 2048, novel_view.py:94-98).
    max_rays_per_call: int = 32768
    # Ray-level cull: skip rendering rays whose every sample is provably
    # farther than dis_threshold from all body vertices — such rays have
    # sigma == -1e5 at every sample (anim_nerf.py:305), so their composite
    # is EXACTLY background (rgb = 1 under white_bkgd, alpha = 0, depth =
    # the per-ray far). Most rays of a real frame are background.
    cull_rays: bool = True
    # Sample-level compaction: even on body-intersecting rays, most of the
    # 64+32 samples lie outside the dis_threshold shell (the near/far span
    # is cam_dist -/+ 1m = 2m vs a ~0.2m shell). A nearest-vertex-distance
    # pre-pass (cheap Pallas min kernel, no top-k) proves samples invalid —
    # the blended kNN distance is a convex combination of neighbour
    # distances, all >= the minimum, so min-dist >= threshold implies
    # valid == 0 and sigma == -1e5 (anim_nerf.py:305). The full kNN +
    # gather/blend + MLP then run only on the compacted survivors and the
    # results are scattered back into the dense (R, K) grid before
    # compositing. Bit-exact: skipped samples' rgb never contributes
    # (weight is exactly 0) and their sigma fill is identical.
    compact_samples: bool = True
    # compacted point capacities are rounded up to multiples of this
    # quantum (+10% headroom) so per-view survivor jitter reuses a handful
    # of compiled programs
    compact_quantum: int = 8192
    # Validity pre-pass flavor: "boxes" = conservative point-in-inflated-
    # chunk-AABB test (ops/knn.py::keep_within_boxes — exact end-to-end,
    # ~30x cheaper than the exact min-dist sweep, which was ~70% of the
    # 512^2 fused render program); "exact" = min_vertex_distance < thr
    # (tightest survivor counts; useful for capacity A/B or non-Morton
    # vertex clouds whose index-chunk boxes would be too loose).
    prepass: str = "boxes"
    prepass_boxes: int = 64

    def _compaction_applicable(self) -> bool:
        cfg = self.system.renderer_cfg
        sc = self.system.scene_cfg
        return (self.compact_samples and self.mesh is None
                and sc.use_unpose and not sc.use_deformation
                and sc.deformation_dim == 0 and sc.apperance_dim == 0
                and cfg.n_fine_depth == 0)

    # ------------------------------------------------- compacted pipeline

    def _rays_root_rotated(self, ctx, rays, P):
        rays_root = rays_to_root_frame(ctx, rays)
        o = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 0:3]) + P[:3, 3]
        d = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 3:6])
        return jnp.concatenate([o, d, rays_root[..., 6:8]], axis=-1)

    def _quantize(self, n: int) -> int:
        """Capacity rung for survivor count n: 10% headroom rounded up to
        a quantum that scales with n (~1/16 of it), so rungs are a small
        DETERMINISTIC set for any count — per-view jitter reuses compiled
        programs and separate processes land on the same rungs (the
        persistent compilation cache then removes their compiles
        entirely). Overflow re-renders exactly at the larger rung."""
        q = self.compact_quantum
        while q * 16 < n:
            q *= 2
        return max(q, -(-int(n * 1.1) // q) * q)

    def _fused_fn(self, params, body_params, body_tmpl, rays, P,
                  cap_c: int, cap_f: int, prepass: str = "boxes",
                  prepass_boxes: int = 64):
        """The whole compacted frame as ONE program: frame geometry,
        coarse validity pre-pass (min-dist Pallas kernel), on-device
        survivor select, compacted coarse warp+MLP, fine-depth proposal +
        its pre-pass, compacted fine pass. Returns (out, n_c, n_f); counts
        above the static capacities mean survivors were dropped — the
        caller re-renders at the true rung (exact)."""
        from animnerf_tpu.ops.knn import keep_within_boxes, min_vertex_distance
        from animnerf_tpu.render.compact import (
            compact_coarse,
            compact_fine,
            select_indices,
        )
        from animnerf_tpu.render.volume_renderer import (
            sample_coarse,
            sample_fine,
        )

        cfg = self.system.renderer_cfg
        thr = self.system.scene_cfg.dis_threshold
        scene = self.system.scene
        ctx = prepare_frame(self.system.body_model, body_params, body_tmpl)
        rays_root = self._rays_root_rotated(ctx, rays, P)
        z_c = sample_coarse(cfg, rays_root, 0.0, None)
        B, R, Kc = z_c.shape

        # Morton-sorted index chunks give the box pre-pass tight AABBs;
        # fall back to mesh-order chunks (still conservative, just looser)
        box_verts = ctx.verts_morton if ctx.verts_morton is not None \
            else ctx.verts

        def keep_of(z, K):
            xyz = (rays_root[..., None, 0:3]
                   + z[..., None] * rays_root[..., None, 3:6]
                   ).reshape(B, R * K, 3)
            if prepass == "boxes":
                # conservative superset of (min dist < thr): exact
                # end-to-end (kept-but-invalid samples sigma-fill in the
                # warp) at ~1/30 the pre-pass cost; survivor counts (and
                # the caps they drive) run ~1.3-1.6x the exact pass's.
                # (A centroid+radius sphere flavor was measured WORSE —
                # 47% vs 32% coarse survivors: Morton chunks are
                # elongated, per-axis AABB extents beat one radius.)
                keep = keep_within_boxes(xyz, box_verts, thr,
                                         nb=prepass_boxes)
            else:
                keep = min_vertex_distance(xyz, ctx.verts) < thr
            return keep, jnp.max(jnp.sum(keep, axis=1)).astype(jnp.int32)

        keep_c, n_c = keep_of(z_c, Kc)
        sel_c = select_indices(keep_c, cap_c)

        def warp_fn(xyz, viewdir):
            return scene.warp_points(ctx, xyz, viewdir)

        def field_fn(xyz, viewdir, valid, use_fine):
            return scene.field_points(params["anim_nerf"], xyz, viewdir,
                                      valid, use_fine)

        # when a fine pass follows, only `weights` is consumed from the
        # coarse composite — skip its rgb fill + sum (need_rgb=False)
        out, weights, warped_c = compact_coarse(
            cfg, warp_fn, field_fn, rays_root, z_c, sel_c, 0.0, None,
            need_rgb=(cfg.n_fine <= 0))
        if cfg.n_fine <= 0:
            return out, n_c, jnp.int32(0)

        mids = 0.5 * (z_c[..., :-1] + z_c[..., 1:])
        z_f = sample_fine(cfg, mids, weights[..., 1:-1], det=True, key=None)
        keep_f, n_f = keep_of(z_f, cfg.n_fine)
        sel_f = select_indices(keep_f, cap_f)
        out = compact_fine(cfg, warp_fn, field_fn, rays_root, z_c, z_f,
                           sel_c, warped_c, sel_f, 0.0, None)
        return out, n_c, n_f

    def _fused_call(self, args, cap_c: int, cap_f: int):
        return self._fused(*args, cap_c=cap_c, cap_f=cap_f,
                           prepass=self.prepass,
                           prepass_boxes=self.prepass_boxes)

    def _prime_caps(self, R: int) -> tuple[int, int]:
        """Initial capacity rungs for an R-ray frame/stream — generous, so
        one program usually covers every view instead of ratchet-climbing
        through several whole-program compiles. The 0.18/0.40 fractions were
        measured with the EXACT min-dist pre-pass (~14% coarse survivors,
        fine up to ~40% under chaotic untrained depths); the boxes pre-pass
        keeps ~1.3-1.6x more (its AABB superset), so its prime scales by
        1.4x — otherwise the first view of a boxes stream usually overflows
        the rung and pays an extra compile (ADVICE r3 item 2)."""
        cfg = self.system.renderer_cfg
        s = 1.4 if self.prepass == "boxes" else 1.0
        return (self._quantize(int(s * 0.18 * R * cfg.n_coarse)),
                self._quantize(int(min(s * 0.40, 1.0)
                                   * R * max(cfg.n_fine, 1))))

    def _render_compact(self, params, body_params, body_tmpl,
                        rays: np.ndarray, P: np.ndarray):
        """Compacted render of a whole frame (or the culled active-ray
        set): one device program, one host sync (the count/overflow check
        rides the same fetch as the frame outputs). Capacities are
        predicted per ray-count from previous frames; an overflow
        re-renders exactly at the larger rung."""
        R = rays.shape[0]
        if R not in self._caps:
            self._caps[R] = self._prime_caps(R)
        cap_c, cap_f = self._caps[R]
        args = (params, body_params, body_tmpl,
                jnp.asarray(rays)[None], jnp.asarray(P))
        first = self._fused_call(args, cap_c, cap_f)
        img, mask, depth, _, _ = self._fetch_ratchet(
            first, (cap_c, cap_f), args, R)
        return np.asarray(img), np.asarray(mask), np.asarray(depth)

    def _fetch_ratchet(self, first, caps_used, args, R):
        """Fetch outputs AND counts of a dispatched fused render in ONE
        device->host round trip; if the counts overflow the caps the render
        was DISPATCHED with, re-render exactly at the ratcheted rung.

        The overflow check must compare against `caps_used` — the caps at
        dispatch time — not the current self._caps[R]: in the pipelined
        stream a previous view's ratchet can raise the shared caps between
        this view's dispatch and its fetch, which would otherwise mask this
        view's overflow and silently return the truncated render.

        LOOPED because raising cap_c changes the coarse composite weights
        (the first render dropped coarse survivors), which moves the fine
        depths, so a retry's fine survivor count can differ; deterministic
        inputs converge in 1-2 extra iterations. Caps only ever move ON
        overflow — ratcheting on every observed count would creep across
        rungs and recompile. Returns (img, mask, depth, i_c, i_f)."""
        cap_c, cap_f = caps_used
        out, n_c, n_f = first
        while True:
            img, mask, depth, i_c, i_f = jax.device_get(
                (out["rgbs"][0], out["alphas"][0, :, 0],
                 out["depths"][0, :, 0], n_c, n_f))
            i_c, i_f = int(i_c), int(i_f)
            if i_c <= cap_c and i_f <= cap_f:
                return img, mask, depth, i_c, i_f
            # never ratchet BELOW caps another view raised meanwhile
            cap_c = max(self._caps[R][0], cap_c, self._quantize(i_c))
            cap_f = max(self._caps[R][1], cap_f, self._quantize(i_f))
            self._caps[R] = (cap_c, cap_f)
            out, n_c, n_f = self._fused_call(args, cap_c, cap_f)

    def _maybe_hit_fn(self, body_params, body_tmpl, rays, P):
        """(B, R) bool: could any sample of this ray be within
        dis_threshold of the body? Conservative proof of the contrary:
        a sample is valid only if it is within thr of some vertex; that
        vertex lies in one of the 32 vertex AABBs, so the sample is
        within thr of that box, so the RAY SEGMENT [near, far] passes
        within thr of it. Segment-vs-(L-inf thr-inflated)-box is a slab
        test — exact along the ray (no sample-spacing slack) and free of
        the (B, R, K, nb, 3) gap tensor a per-sample test materialises
        (~1.6 GB at 512^2, ~0.18 s/view of pure HBM traffic). Also
        returns the per-ray tightened far."""
        scene_cfg = self.system.scene_cfg
        ctx = prepare_frame(self.system.body_model, body_params, body_tmpl)
        rays_root = rays_to_root_frame(ctx, rays)
        o = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 0:3]) + P[:3, 3]
        d = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 3:6])

        # vertex AABBs over index chunks — Morton-tight would be ideal,
        # but index chunks of the (possibly arbitrary-order) mesh are kept
        # for cheapness; 32 boxes bound the slack
        B, V = ctx.verts.shape[:2]
        nb = 32
        pad = (-V) % nb
        vv = jnp.pad(ctx.verts, ((0, 0), (0, pad), (0, 0)), mode="edge")
        vv = vv.reshape(B, nb, -1, 3)
        thr = scene_cfg.dis_threshold
        lo = vv.min(axis=2) - thr  # (B, nb, 3) L-inf inflation covers L2
        hi = vv.max(axis=2) + thr

        near = rays_root[..., 6]
        far = rays_root[..., 7]
        # safe reciprocal; d == 0 axes are overwritten by `inside` below
        inv = 1.0 / jnp.where(d == 0, 1.0, d)
        t0 = (lo[:, None] - o[:, :, None]) * inv[:, :, None]   # (B, R, nb, 3)
        t1 = (hi[:, None] - o[:, :, None]) * inv[:, :, None]
        tmin = jnp.minimum(t0, t1)
        tmax = jnp.maximum(t0, t1)
        # d == 0 on an axis: inside the slab iff lo <= o <= hi
        inside = ((o[:, :, None] >= lo[:, None])
                  & (o[:, :, None] <= hi[:, None]))
        tmin = jnp.where((d == 0)[:, :, None], jnp.where(inside, -jnp.inf,
                                                         jnp.inf), tmin)
        tmax = jnp.where((d == 0)[:, :, None], jnp.where(inside, jnp.inf,
                                                         -jnp.inf), tmax)
        enter = jnp.maximum(tmin.max(axis=-1), near[..., None])  # (B, R, nb)
        exit_ = jnp.minimum(tmax.min(axis=-1), far[..., None])
        maybe = jnp.any(enter <= exit_, axis=-1)                 # (B, R)
        return maybe, far

    def render_frame(self, params, body_params, body_tmpl, rays: np.ndarray,
                     P: Optional[np.ndarray] = None,
                     img_wh: Optional[tuple[int, int]] = None,
                     _cull: bool = True):
        """rays (R, 8) -> dict with img (H,W,3), mask (H,W), depth (H,W).

        _cull is internal: the culled-active-set recursion passes False so
        a padded set (which contains INACTIVE padding rays by design, see
        _pad_ray_ids) is rendered as-is instead of re-culling forever."""
        if P is None:
            P = np.eye(4, dtype=np.float32)
        n = rays.shape[0]
        cap = self.max_rays_per_call

        cfg = self.system.renderer_cfg
        can_cull = (_cull and self.cull_rays and self.mesh is None
                    and n > cap and self.system.scene_cfg.use_unpose
                    and cfg.n_fine_depth == 0)
        if can_cull:
            maybe, fars = jax.device_get(self._maybe_hit(
                body_params, body_tmpl, jnp.asarray(rays)[None],
                jnp.asarray(P)))  # one fetch: each costs a full round trip
            maybe = np.asarray(maybe[0])
            fars = np.asarray(fars[0])
            active = np.nonzero(maybe)[0]
            if len(active) < n:  # render only body-intersecting rays
                bg = 1.0 if cfg.white_bkgd else 0.0
                img = np.full((n, 3), bg, np.float32)
                mask = np.zeros(n, np.float32)
                # culled rays composite to depth == far under white_bkgd
                # (volume_rendering.py:151-153), 0 otherwise
                depth = fars.astype(np.float32) if cfg.white_bkgd \
                    else np.zeros(n, np.float32)
                if len(active):
                    # pad to a coarse quantum: under the compact renderer a
                    # new active-ray count compiles a whole new fused
                    # program, so per-view counts must collapse onto ONE
                    # shape. Padded outputs are discarded, so ANY ray index
                    # is exact — pad with INACTIVE (body-missing) rays,
                    # which contribute zero in-shell samples: duplicating
                    # the last ACTIVE ray instead measured ~45% fake
                    # survivors at 512^2 (43k copies of a body-hitting ray)
                    quantum = 32768 if self._compaction_applicable() \
                        else 8192
                    pad = (-len(active)) % quantum
                    act = np.concatenate(
                        [active, _pad_ray_ids(maybe, active, pad)]) \
                        if pad else active
                    ai, am, ad = self.render_frame(
                        params, body_params, body_tmpl, rays[act], P,
                        _cull=False)
                    img[active] = ai[:len(active)]
                    mask[active] = am[:len(active)]
                    depth[active] = ad[:len(active)]
                if img_wh is not None:
                    W, H = img_wh
                    return (img.reshape(H, W, 3), mask.reshape(H, W),
                            depth.reshape(H, W))
                return img, mask, depth

        # the compact path renders any R in one program (its dense buffers
        # are (R*K,) scalars, not (R, K, warp) tensors, so a full 512^2
        # frame fits HBM without slabbing); slabs only beyond 256k rays
        compact_cap = cap * 8 if self._compaction_applicable() else cap
        if self.mesh is None and n > compact_cap:
            parts = [self.render_frame(params, body_params, body_tmpl,
                                       rays[i:i + compact_cap], P,
                                       _cull=_cull)
                     for i in range(0, n, compact_cap)]
            img = np.concatenate([p[0] for p in parts])
            mask = np.concatenate([p[1] for p in parts])
            depth = np.concatenate([p[2] for p in parts])
            if img_wh is not None:
                W, H = img_wh
                return img.reshape(H, W, 3), mask.reshape(H, W), \
                    depth.reshape(H, W)
            return img, mask, depth

        if self._compaction_applicable():
            img, mask, depth = self._render_compact(
                params, body_params, body_tmpl, rays, np.asarray(P))
            if img_wh is not None:
                W, H = img_wh
                return (img.reshape(H, W, 3), mask.reshape(H, W),
                        depth.reshape(H, W))
            return img, mask, depth

        rays_b = jnp.asarray(rays)[None]
        if self.mesh is not None:
            from animnerf_tpu.parallel.mesh import ray_sharding

            rays_b = jax.device_put(rays_b, ray_sharding(self.mesh))
        out = self._render(params, body_params, body_tmpl, rays_b,
                           jnp.asarray(P))
        rgb_key = "rgbs_fine" if "rgbs_fine" in out else "rgbs"
        a_key = "alphas_fine" if "alphas_fine" in out else "alphas"
        d_key = "depths_fine" if "depths_fine" in out else "depths"
        img = np.asarray(out[rgb_key][0])
        mask = np.asarray(out[a_key][0, :, 0])
        depth = np.asarray(out[d_key][0, :, 0])
        if img_wh is not None:
            W, H = img_wh
            img = img.reshape(H, W, 3)
            mask = mask.reshape(H, W)
            depth = depth.reshape(H, W)
        return img, mask, depth

    # ------------------------------------------------- pipelined streaming

    def render_stream(self, params, frames):
        """Pipelined rendering of a SEQUENCE of views (turntables, mocap
        streams). `frames` is an iterable of dicts with keys body_params,
        body_tmpl, rays (R, 8) np, P (4, 4) np, img_wh (optional).
        Yields (img, mask, depth) per frame, in order.

        Per-view, render_frame is fully synchronous: fetch maybe_hit ->
        dispatch the fused program -> fetch outputs, paying ~3 host<->device
        round trips (~0.13 s each on this tunneled chip) of dead device
        time per view. Here view i+1's maybe_hit is enqueued BEFORE view
        i's fused program and the output fetch trails one view behind, so
        every round trip overlaps the device compute of a neighbouring
        view — steady-state cost becomes the device time alone
        (VERDICT r2 ask 2; reference loop: novel_view.py:94-116).

        Capacities are also driven DOWN here: when the observed survivor
        counts of the last `shrink_after` views all fit a smaller rung,
        the caps shrink to it (render_frame only ever ratchets up from the
        generous prime — fine was primed at 40% of samples, so a stream
        whose true fine survivor rate is ~15% would otherwise pay ~2.7x
        the needed fine compute forever)."""
        frames = list(frames)
        n = len(frames)
        if n == 0:
            return
        if not self._compaction_applicable() or not self.cull_rays:
            for f in frames:
                yield self.render_frame(params, f["body_params"],
                                        f["body_tmpl"], f["rays"],
                                        f.get("P"), f.get("img_wh"))
            return

        cfg = self.system.renderer_cfg
        quantum = 32768
        mh = [None] * n
        pending: list = []  # (frame_i, first_out, caps_used, args, active, fars, R_act)
        history: dict = {}  # R_act -> list of recent (n_c, n_f)
        shrink_after = 2

        # Host->device transfers over this environment's tunneled chip cost
        # ~130 ms per round trip; a turntable re-uses ONE ray grid across
        # every view, so upload it once (8.4 MB at 512^2) and slice the
        # culled active set ON DEVICE (the per-view upload drops from the
        # (R, 8) f32 slab to the (R,) s32 index vector).
        rays_dev_cache: dict = {}

        def rays_dev_of(f):
            # keyed by the host array OBJECT (not id()): the entry keeps the
            # host array alive, so CPython can never reuse its id for a
            # different frame's grid, and reuse is checked with `is`
            host = f["rays"]
            cached = rays_dev_cache.get("entry")
            if cached is None or cached[0] is not host:
                # streams use one grid; keep 1 entry
                rays_dev_cache["entry"] = (host, jnp.asarray(host))
            return rays_dev_cache["entry"][1]

        def dispatch_mh(i):
            f = frames[i]
            P = f.get("P")
            P = np.eye(4, dtype=np.float32) if P is None else P
            mh[i] = self._maybe_hit(f["body_params"], f["body_tmpl"],
                                    rays_dev_of(f)[None], jnp.asarray(P))

        def dispatch_fused(i):
            f = frames[i]
            P = f.get("P")
            P = np.eye(4, dtype=np.float32) if P is None else P
            maybe, fars = jax.device_get(mh[i])
            mh[i] = None
            maybe = np.asarray(maybe[0])
            fars = np.asarray(fars[0])
            active = np.nonzero(maybe)[0]
            if len(active) == 0:
                pending.append((i, None, None, None, active, fars, 0))
                return
            pad = (-len(active)) % quantum
            act = np.concatenate([active, _pad_ray_ids(maybe, active, pad)]) \
                if pad else active
            R = len(act)
            if R not in self._caps:
                self._caps[R] = self._prime_caps(R)
            cap_c, cap_f = self._caps[R]
            rays_act = jnp.take(rays_dev_of(f), jnp.asarray(act), axis=0)
            args = (params, f["body_params"], f["body_tmpl"],
                    rays_act[None], jnp.asarray(P))
            first = self._fused_call(args, cap_c, cap_f)
            pending.append((i, first, (cap_c, cap_f), args, active, fars, R))

        def finalize(entry):
            i, first, caps_used, args, active, fars, R = entry
            f = frames[i]
            n_rays = f["rays"].shape[0]
            bg = 1.0 if cfg.white_bkgd else 0.0
            img = np.full((n_rays, 3), bg, np.float32)
            mask = np.zeros(n_rays, np.float32)
            depth = fars.astype(np.float32) if cfg.white_bkgd \
                else np.zeros(n_rays, np.float32)
            if first is not None:
                # fetch + exact overflow re-render against the caps THIS
                # view was dispatched with (synchronous; rare after the
                # first view) — shared with render_frame
                ai, am, ad, i_c, i_f = self._fetch_ratchet(
                    first, caps_used, args, R)
                # shrink caps when the last few views all fit a smaller rung
                h = history.setdefault(R, [])
                h.append((i_c, i_f))
                del h[:-shrink_after]
                if len(h) == shrink_after:
                    want = (self._quantize(max(c for c, _ in h)),
                            self._quantize(max(fc for _, fc in h)))
                    cur = self._caps[R]
                    # every (cap_c, cap_f) pair is a separate compile of
                    # the whole fused program (minutes on this tunnel):
                    # only shrink when it buys >= 25% of the padded work
                    if (want[0] <= cur[0] and want[1] <= cur[1]
                            and want[0] + want[1]
                            <= 0.75 * (cur[0] + cur[1])):
                        self._caps[R] = want
                img[active] = ai[:len(active)]
                mask[active] = am[:len(active)]
                depth[active] = ad[:len(active)]
            wh = f.get("img_wh")
            if wh is not None:
                W, H = wh
                return img.reshape(H, W, 3), mask.reshape(H, W), \
                    depth.reshape(H, W)
            return img, mask, depth

        dispatch_mh(0)
        for i in range(n):
            if i + 1 < n:
                dispatch_mh(i + 1)
            dispatch_fused(i)
            if len(pending) > 1:
                yield finalize(pending.pop(0))
        while pending:
            yield finalize(pending.pop(0))

    def query_sigma_observed(self, params, body_params, body_tmpl,
                             points: np.ndarray, use_fine: bool = True,
                             chunk: int = 262144) -> np.ndarray:
        """relu(sigma) at observed-space points (mesh extraction;
        reference extract_mesh.py:49-61 — queries go through unpose)."""
        ctx = prepare_frame(self.system.body_model, body_params, body_tmpl)

        @jax.jit
        def q(pts):
            _, sigma = self.system.scene.apply_points(
                params["anim_nerf"], ctx, pts, jnp.zeros_like(pts),
                use_fine=use_fine)
            return jax.nn.relu(sigma)

        outs = []
        for i in range(0, points.shape[1], chunk):
            outs.append(np.asarray(q(jnp.asarray(points[:, i:i + chunk]))))
        return np.concatenate(outs, axis=1)
