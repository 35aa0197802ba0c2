"""Surface-rig measurements: the shelved geometry ops in their intended regime.

Round-2 shelved two ops after measuring them on the volumetric blob rig
(PERF.md): the two-stage cluster-pruned kNN (since removed; see PERF.md
round 4) and the sample-compacted trainer. Both were built for the regime
real captures live in — a 2-manifold body (tight 2-D vertex clusters) seen
through patch-coherent camera rays. Round 4 ran this tool on the real
chip: the surface rig keeps ~36% of coarse samples (the reference's fixed
near=0.1/far=10 bounds, anim_nerf_dataset.py:211, put most of every
foreground ray inside the dis_threshold shell), dense beat compact 66.3k
vs 30.6k rays/s, and the brute kNN beat the cluster variant 47 vs 126 ms —
so the cluster op was deleted and CompactTrainer stays a documented opt-in.

This tool measures, on the surface rig (data/synthetic.py make_rig
surface=True) with foreground_pixel-style patch rays:
  1. coarse in-shell survivor fraction,
  2. dense vs compacted train-step throughput,
  3. brute-force kNN latency on the train-step point set.

Usage: python tools/bench_surface.py   (real chip; one JSON line per probe)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def patch_rays(verts: np.ndarray, B: int, n_patches: int = 1,
               patch: int = 32, seed: int = 0, fore_rate: float = 0.9):
    """(B, n_patches*patch^2, 8) rays from an orbiting camera, aimed so
    ~fore_rate of each 32x32 patch covers the body (the reference's
    foreground_pixel regime, anim_nerf_dataset.py:30-48)."""
    rng = np.random.default_rng(seed)
    R = n_patches * patch * patch
    out = np.zeros((B, R, 8), np.float32)
    center = verts.mean(axis=0)
    for b in range(B):
        th = rng.uniform(0, 2 * np.pi)
        cam = center + 2.8 * np.array([np.cos(th), 0.15, np.sin(th)])
        fwd = center - cam
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        f = 1.2 * 512  # flagship focal at 512^2
        rays = []
        for _ in range(n_patches):
            # aim the patch at a random body vertex (foreground) or just
            # off the silhouette (background band)
            tgt = verts[rng.integers(0, len(verts))]
            if rng.random() > fore_rate:
                tgt = tgt + rng.normal(scale=0.25, size=3)
            d0 = tgt - cam
            # pixel offsets of the patch around the target's projection
            z = d0 @ fwd
            u0 = (d0 @ right) / z * f
            v0 = (d0 @ up2) / z * f
            uu = u0 + np.arange(patch) - patch / 2
            vv = v0 + np.arange(patch) - patch / 2
            U, Vv = np.meshgrid(uu, vv)
            dirs = (U[..., None] / f * right + Vv[..., None] / f * up2
                    + fwd)
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
            o = np.broadcast_to(cam, dirs.shape)
            near = np.full(dirs.shape[:-1] + (1,), 0.1, np.float32)
            far = np.full(dirs.shape[:-1] + (1,), 10.0, np.float32)
            rays.append(np.concatenate(
                [o, dirs, near, far], axis=-1).reshape(-1, 8))
        out[b] = np.concatenate(rays, axis=0)[:R]
    return out.astype(np.float32)


def main() -> None:
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_system
    from animnerf_tpu.data.synthetic import make_body_model, random_pose_params
    from animnerf_tpu.models.body_params import init_body_params
    from animnerf_tpu.models.warp import prepare_frame, rays_to_root_frame
    from animnerf_tpu.training.system import AnimNeRFSystem

    cfg, _, params_for, num_joints = _flagship_system(tiny=False)
    cfg.compute_dtype = "bfloat16"
    cfg.remat = False
    body_model = make_body_model(num_verts=6890, num_joints=24, seed=0,
                                 surface=True)
    system = AnimNeRFSystem(cfg, body_model)
    verts_np = np.asarray(body_model.v_template)

    B, n_rays = 16, 1024
    rng_np = np.random.default_rng(0)
    tmpl = {k: np.array(v) for k, v in params_for(2, B).items()}
    tmpl["transl"] = np.zeros_like(tmpl["transl"])
    base = {
        "frame_idx": np.arange(B, dtype=np.int32) % cfg.num_frames,
        "rgbs": rng_np.uniform(size=(B, n_rays, 3)).astype(np.float32),
        "alphas": rng_np.uniform(size=(B, n_rays, 1)).astype(np.float32),
        "fg_points": rng_np.normal(scale=0.2, size=(B, 128, 3)).astype(np.float32),
        "bg_points": rng_np.normal(scale=0.8, size=(B, 128, 3)).astype(np.float32),
        **{k + "_template": v for k, v in tmpl.items()},
    }

    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames,
                                   pose_dim=3 * (num_joints - 1))
    state0 = system.init_state(rng, body_params, steps_per_epoch=100)
    tx = system.make_optimizer(steps_per_epoch=100)
    key = jax.random.PRNGKey(1)

    batches = []
    for s in range(21):
        b = dict(base)
        b["rays"] = patch_rays(verts_np, B, seed=s)
        batches.append(jax.device_put(b))

    # ---- survivor fractions (coarse stratified samples vs dis_threshold)
    from animnerf_tpu.models.body_params import (
        batch_params_from_data,
        lookup_body_params,
    )
    from animnerf_tpu.ops.knn import min_vertex_distance
    from animnerf_tpu.render.volume_renderer import sample_coarse

    @jax.jit
    def survivors(batch):
        bp = lookup_body_params(
            jax.device_get(state0.params)["body_params"]
            if False else state0.params["body_params"], batch["frame_idx"])
        btm = batch_params_from_data(batch, cfg.model_type, template=True)
        ctx = prepare_frame(system.body_model, bp, btm)
        rays_root = rays_to_root_frame(ctx, batch["rays"])
        z = sample_coarse(system.renderer_cfg, rays_root, 0.0, None)
        Bq, Rq, Kq = z.shape
        pts = (rays_root[..., None, 0:3]
               + z[..., None] * rays_root[..., None, 3:6]).reshape(Bq, -1, 3)
        d = min_vertex_distance(pts, ctx.verts)
        return jnp.mean((d < cfg.dis_threshold).astype(jnp.float32))

    frac = float(np.mean([float(survivors(b)) for b in batches[:4]]))
    print(json.dumps({"metric": "surface_coarse_survivor_frac",
                      "value": round(frac, 4)}), flush=True)

    # ---- dense vs compacted step
    def run(step, state, tag):
        st = state
        for b in batches:
            st, metrics = step(st, b, key)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for s in range(20):
            st, metrics = step(st, batches[s], key)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        rps = B * n_rays * 20 / dt
        print(json.dumps({"metric": f"surface_train_rays_per_sec_{tag}",
                          "value": round(rps, 1)}), flush=True)
        return rps

    dense_step = jax.jit(system.make_train_step(tx))
    run(dense_step, state0, "dense")

    compact = system.make_compact_trainer(tx, pipelined=True)
    run(compact.step, state0, "compact")

    # ---- kNN timing on the real point set (the two-stage cluster probe
    # was removed with ops/knn_cluster.py after it measured 126 ms vs the
    # brute kernel's 47 ms on this very rig — PERF.md round 4)
    from animnerf_tpu.ops.knn_pallas import knn_pallas

    bp = lookup_body_params(state0.params["body_params"],
                            jnp.asarray(base["frame_idx"]))
    btm = batch_params_from_data(jax.device_put(base), cfg.model_type,
                                 template=True)
    ctx = prepare_frame(system.body_model, bp, btm)

    @jax.jit
    def points_of(rays):
        rays_root = rays_to_root_frame(ctx, rays)
        z = sample_coarse(system.renderer_cfg, rays_root, 0.0, None)
        Bq = z.shape[0]
        return (rays_root[..., None, 0:3]
                + z[..., None] * rays_root[..., None, 3:6]).reshape(Bq, -1, 3)

    pts_sets = [points_of(b["rays"]) for b in batches]
    jax.block_until_ready(pts_sets[-1])

    for name, fn in (
        ("brute", lambda p: knn_pallas(p, ctx.verts, k=4, packed=True)),
    ):
        o = fn(pts_sets[-1])
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for p in pts_sets[:20]:
            o = fn(p)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 20
        print(json.dumps({"metric": f"surface_knn_{name}_ms",
                          "value": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
