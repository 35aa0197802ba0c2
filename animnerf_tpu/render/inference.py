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


class Renderer:
    """Caches the jitted render program across frames/views."""

    def __init__(self, system: AnimNeRFSystem, mesh=None):
        self.system = system
        self.mesh = mesh
        self._render = jax.jit(self._render_fn, static_argnames=())
        self._maybe_hit = jax.jit(self._maybe_hit_fn)
        self._prepass = jax.jit(self._prepass_fn)
        self._coarse = jax.jit(self._coarse_fn)
        self._fine = jax.jit(self._fine_fn)
        # device-side compaction: flat keep mask -> first `cap` survivor
        # indices (padded with 0 — padded entries recompute index 0's value
        # and scatter it again, which is exact). Compiled per ladder rung.
        self._select = jax.jit(
            lambda keep, cap: jnp.nonzero(keep, size=cap, fill_value=0)[0]
            .astype(jnp.int32), static_argnames=("cap",))

    def _render_fn(self, params, body_params, body_tmpl, rays, P):
        ctx = prepare_frame(self.system.body_model, body_params, body_tmpl)
        rays_root = rays_to_root_frame(ctx, rays)
        # rotate rays about the body in the root frame (novel_view.py:91-92)
        o = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 0:3]) + P[:3, 3]
        d = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 3:6])
        rays_root = jnp.concatenate([o, d, rays_root[..., 6:8]], axis=-1)

        scene = self.system.scene

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
    # compacted point counts are padded up a 1.5x-geometric ladder so a
    # handful of compiled shapes cover all slabs/views
    compact_quantum: int = 8192

    def _pad_ladder(self, n: int) -> int:
        size = self.compact_quantum
        while size < n:
            size = int(size * 3 // 2)
        return size

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

    def _prepass_fn(self, body_params, body_tmpl, rays, P):
        """Phase A: frame geometry, coarse depths, validity pre-pass.

        Returns (ctx, rays_root, z_coarse, keep (1, R*Kc) bool)."""
        from animnerf_tpu.ops.knn import min_vertex_distance
        from animnerf_tpu.render.volume_renderer import sample_coarse

        cfg = self.system.renderer_cfg
        ctx = prepare_frame(self.system.body_model, body_params, body_tmpl)
        rays_root = self._rays_root_rotated(ctx, rays, P)
        z_c = sample_coarse(cfg, rays_root, 0.0, None)  # (1, R, Kc)
        B, R, Kc = z_c.shape
        xyz = (rays_root[..., None, 0:3]
               + z_c[..., None] * rays_root[..., None, 3:6]).reshape(B, R * Kc, 3)
        dmin = min_vertex_distance(xyz, ctx.verts)
        keep = dmin < self.system.scene_cfg.dis_threshold
        return ctx, rays_root, z_c, keep, jnp.sum(keep, dtype=jnp.int32)

    def _points_at(self, rays_root, z_flat, sel, K):
        """Gather the sample points/viewdirs selected by flat indices
        sel (N,) into the (R*K)-flattened sample grid."""
        ray_i = sel // K
        rays_sel = rays_root[0, ray_i]                       # (N, 8)
        z_sel = z_flat[sel]                                  # (N,)
        xyz = rays_sel[:, 0:3] + z_sel[:, None] * rays_sel[:, 3:6]
        return xyz[None], rays_sel[None, :, 3:6]             # (1,N,3) x2

    def _coarse_fn(self, params, ctx, rays_root, z_c, sel):
        """Phase B: warp+MLP on compacted coarse samples, dense composite,
        fine-depth proposal + its validity pre-pass."""
        from animnerf_tpu.ops.knn import min_vertex_distance
        from animnerf_tpu.render.volume_renderer import composite, sample_fine

        cfg = self.system.renderer_cfg
        scene = self.system.scene
        B, R, Kc = z_c.shape
        from animnerf_tpu.models.anim_nerf import SIGMA_OUTSIDE

        xyz, vd = self._points_at(rays_root, z_c.reshape(-1), sel, Kc)
        cano, vd2, valid = scene.warp_points(ctx, xyz, vd)
        rgb, sigma = scene.field_points(params["anim_nerf"], cano, vd2,
                                        valid, use_fine=False)

        sigma_d = jnp.full((R * Kc,), SIGMA_OUTSIDE, sigma.dtype)
        sigma_d = sigma_d.at[sel].set(sigma[0, :, 0]).reshape(1, R, Kc)
        rgb_d = jnp.zeros((R * Kc, 3), rgb.dtype)
        rgb_d = rgb_d.at[sel].set(rgb[0]).reshape(1, R, Kc, 3)

        weights, rgb_c, depth_c, alpha_c = composite(
            cfg, rgb_d, sigma_d, rays_root, z_c, 0.0, None)
        out = {"rgbs": rgb_c, "alphas": alpha_c, "depths": depth_c}

        z_f = keep_f = n_f = None
        if cfg.n_fine > 0:
            mids = 0.5 * (z_c[..., :-1] + z_c[..., 1:])
            z_f = sample_fine(cfg, mids, weights[..., 1:-1], det=True,
                              key=None)
            xyz_f = (rays_root[..., None, 0:3]
                     + z_f[..., None] * rays_root[..., None, 3:6]
                     ).reshape(B, R * cfg.n_fine, 3)
            keep_f = min_vertex_distance(xyz_f, ctx.verts) \
                < self.system.scene_cfg.dis_threshold
            n_f = jnp.sum(keep_f, dtype=jnp.int32)
        return out, z_f, keep_f, n_f, (cano, vd2, valid)

    def _fine_fn(self, params, ctx, rays_root, z_c, z_f, sel_c, warped_c,
                 sel_f):
        """Phase C: warp compacted fine samples, one fine-MLP pass over
        (compacted coarse + fine), dense merge-sort composite."""
        from animnerf_tpu.models.anim_nerf import SIGMA_OUTSIDE
        from animnerf_tpu.render.volume_renderer import composite

        cfg = self.system.renderer_cfg
        scene = self.system.scene
        B, R, Kc = z_c.shape
        Kf = z_f.shape[-1]
        Kall = Kc + Kf

        xyz_f, vd_f = self._points_at(rays_root, z_f.reshape(-1), sel_f, Kf)
        cano_f, vd_f2, valid_f = scene.warp_points(ctx, xyz_f, vd_f)

        cano_c, vd_c, valid_c = warped_c
        cano = jnp.concatenate([cano_c, cano_f], axis=1)
        vd = None if vd_c is None else jnp.concatenate([vd_c, vd_f2], axis=1)
        valid = jnp.concatenate([valid_c, valid_f], axis=1)
        rgb, sigma = scene.field_points(params["anim_nerf"], cano, vd, valid,
                                        use_fine=True)

        # dense concat layout (R, Kc + Kf): coarse slots first — the same
        # order the dense renderer concatenates before its merge sort
        idx_c = (sel_c // Kc) * Kall + (sel_c % Kc)
        idx_f = (sel_f // Kf) * Kall + Kc + (sel_f % Kf)
        idx_all = jnp.concatenate([idx_c, idx_f])
        sigma_d = jnp.full((R * Kall,), SIGMA_OUTSIDE, sigma.dtype)
        sigma_d = sigma_d.at[idx_all].set(sigma[0, :, 0]).reshape(1, R, Kall)
        rgb_d = jnp.zeros((R * Kall, 3), rgb.dtype)
        rgb_d = rgb_d.at[idx_all].set(rgb[0]).reshape(1, R, Kall, 3)

        z_all = jnp.concatenate([z_c, z_f], axis=-1)
        order = jnp.argsort(z_all, axis=-1)
        z_sorted = jnp.take_along_axis(z_all, order, axis=-1)
        sigma_s = jnp.take_along_axis(sigma_d, order, axis=-1)
        rgb_s = jnp.take_along_axis(rgb_d, order[..., None], axis=2)

        _, rgb_f, depth_f, alpha_f = composite(
            cfg, rgb_s, sigma_s, rays_root, z_sorted, 0.0, None)
        return {"rgbs": rgb_f, "alphas": alpha_f, "depths": depth_f}

    def _render_compact(self, params, body_params, body_tmpl,
                        rays: np.ndarray, P: np.ndarray):
        """Compacted render of a whole frame (or the culled active-ray
        set) as ONE coarse + ONE fine program. The only host syncs are the
        two 4-byte survivor counts that pick the ladder rungs; survivor
        index selection runs on-device (jnp.nonzero with a static size)."""
        cfg = self.system.renderer_cfg
        ctx, rays_root, z_c, keep, n_c = self._prepass(
            body_params, body_tmpl, jnp.asarray(rays)[None], jnp.asarray(P))
        cap_c = self._pad_ladder(max(int(n_c), 1))
        sel_c = self._select(keep[0], cap_c)
        out, z_f, keep_f, n_f, warped_c = self._coarse(
            params, ctx, rays_root, z_c, sel_c)
        if cfg.n_fine > 0:
            cap_f = self._pad_ladder(max(int(n_f), 1))
            sel_f = self._select(keep_f[0], cap_f)
            out = self._fine(params, ctx, rays_root, z_c, z_f, sel_c,
                             warped_c, sel_f)
        img = np.asarray(out["rgbs"][0])
        mask = np.asarray(out["alphas"][0, :, 0])
        depth = np.asarray(out["depths"][0, :, 0])
        return img, mask, depth

    def _maybe_hit_fn(self, body_params, body_tmpl, rays, P):
        """(B, R) bool: could any sample of this ray be within
        dis_threshold of the body? Conservative (Lipschitz-1 along the
        ray; 8 vertex AABBs). Also returns the per-ray tightened far."""
        cfg = self.system.renderer_cfg
        scene_cfg = self.system.scene_cfg
        ctx = prepare_frame(self.system.body_model, body_params, body_tmpl)
        rays_root = rays_to_root_frame(ctx, rays)
        o = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 0:3]) + P[:3, 3]
        d = jnp.einsum("ij,brj->bri", P[:3, :3], rays_root[..., 3:6])
        rays_root = jnp.concatenate([o, d, rays_root[..., 6:8]], axis=-1)

        from animnerf_tpu.render.volume_renderer import sample_coarse

        z = sample_coarse(cfg, rays_root, 0.0, None)  # (B, R, Kc)
        pts = (rays_root[..., None, 0:3]
               + z[..., None] * rays_root[..., None, 3:6])  # (B, R, K, 3)

        # 8 vertex AABBs over index chunks (SMPL ordering is spatially
        # semi-coherent, so the boxes are reasonably tight)
        B, V = ctx.verts.shape[:2]
        nb = 8
        pad = (-V) % nb
        vv = jnp.pad(ctx.verts, ((0, 0), (0, pad), (0, 0)), mode="edge")
        vv = vv.reshape(B, nb, -1, 3)
        lo = vv.min(axis=2)  # (B, nb, 3)
        hi = vv.max(axis=2)

        gap = jnp.maximum(
            jnp.maximum(lo[:, None, None] - pts[:, :, :, None], 0.0),
            jnp.maximum(pts[:, :, :, None] - hi[:, None, None], 0.0))
        lb = jnp.sqrt(jnp.sum(gap * gap, axis=-1)).min(axis=-1)  # (B, R, K)

        # Lipschitz cover of the whole [z_0, z_last] segment: any point
        # between samples i, i+1 is within spacing of one of them
        spacing = jnp.max(z[..., 1:] - z[..., :-1], axis=-1)  # (B, R)
        thr = scene_cfg.dis_threshold
        maybe = jnp.any(lb < (thr + spacing[..., None]), axis=-1)  # (B, R)
        return maybe, rays_root[..., 7]

    def render_frame(self, params, body_params, body_tmpl, rays: np.ndarray,
                     P: Optional[np.ndarray] = None,
                     img_wh: Optional[tuple[int, int]] = None):
        """rays (R, 8) -> dict with img (H,W,3), mask (H,W), depth (H,W)."""
        if P is None:
            P = np.eye(4, dtype=np.float32)
        n = rays.shape[0]
        cap = self.max_rays_per_call

        cfg = self.system.renderer_cfg
        can_cull = (self.cull_rays and self.mesh is None and n > cap
                    and self.system.scene_cfg.use_unpose
                    and cfg.n_fine_depth == 0)
        if can_cull:
            maybe, fars = self._maybe_hit(
                body_params, body_tmpl, jnp.asarray(rays)[None],
                jnp.asarray(P))
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
                    # pad to an 8k quantum so per-view active counts reuse a
                    # handful of compiled shapes instead of recompiling
                    quantum = 8192
                    pad = (-len(active)) % quantum
                    act = np.concatenate(
                        [active, np.repeat(active[-1:], pad)]) \
                        if pad else active
                    ai, am, ad = self.render_frame(
                        params, body_params, body_tmpl, rays[act], P)
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
                                       rays[i:i + compact_cap], P)
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
