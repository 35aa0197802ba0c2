"""Ablation profiler for the train step's "long tail" (PERF.md round 3).

Times the full flagship train step and a ladder of ablations to attribute
the ~130 ms that previous op-level profiles left unitemised
(sampling/composite/losses/FK). Each variant times value_and_grad + Adam
update, 10 steps with distinct inputs (the runtime dedups identical
executions).

Usage: python tools/profile_step.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, batches, state, key, n=10):
    import jax

    for b in batches:
        out = fn(state, b, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for s in range(n):
        out = fn(state, batches[s % len(batches)], key)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_system, _rays
    from animnerf_tpu.models.body_params import init_body_params
    from animnerf_tpu.training.system import AnimNeRFSystem, TrainState

    cfg, system, params_for, num_joints = _flagship_system(tiny=False)
    B, n_rays = 16, 1024
    cfg.compute_dtype = "bfloat16"
    cfg.remat = False
    system = AnimNeRFSystem(cfg, system.body_model)
    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames, pose_dim=3 * (num_joints - 1))
    state = system.init_state(rng, body_params, steps_per_epoch=100)
    tx = system.make_optimizer(steps_per_epoch=100)

    rng_np = np.random.default_rng(0)
    tmpl = {k: np.array(v) for k, v in params_for(2, B).items()}
    tmpl["transl"] = np.zeros_like(tmpl["transl"])
    base = {
        "frame_idx": np.arange(B, dtype=np.int32) % cfg.num_frames,
        "rays": _rays(B, n_rays),
        "rgbs": rng_np.uniform(size=(B, n_rays, 3)).astype(np.float32),
        "alphas": rng_np.uniform(size=(B, n_rays, 1)).astype(np.float32),
        "fg_points": rng_np.normal(scale=0.2, size=(B, 128, 3)).astype(np.float32),
        "bg_points": rng_np.normal(scale=0.8, size=(B, 128, 3)).astype(np.float32),
        **{k + "_template": v for k, v in tmpl.items()},
    }
    key = jax.random.PRNGKey(1)
    batches = []
    for s in range(10):
        b = dict(base)
        b["rays"] = _rays(B, n_rays, seed=s)
        batches.append(jax.device_put(b))

    def step_of(loss_fn):
        def train_step(state, batch, k):
            kk = jax.random.fold_in(k, state.step)
            (loss, details), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, kk)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=params,
                              opt_state=opt_state), details

        return jax.jit(train_step)

    results = {}

    # 1. full step
    results["full"] = timed(step_of(system.loss_fn), batches, state, key)

    # 2. no normal-smoothness loss (4 query_normal = JVP MLP passes)
    import animnerf_tpu.training.system as S

    orig_compute = system.compute_loss

    def loss_no_normals(params, batch, k):
        c = system.cfg
        from animnerf_tpu.models.body_params import (
            batch_params_from_data,
            lookup_body_params,
        )

        frame_idx = batch["frame_idx"]
        body_params = lookup_body_params(params["body_params"], frame_idx)
        body_tmpl = batch_params_from_data(batch, c.model_type, template=True)
        k_render, k_loss = jax.random.split(k)
        results_, ctx = system.render(params, body_params, body_tmpl,
                                      batch["rays"], frame_idx, perturb=1.0,
                                      key=k_render)
        t = c.train
        loss = jnp.mean((results_["rgbs"] - batch["rgbs"]) ** 2)
        loss += jnp.mean((results_["rgbs_fine"] - batch["rgbs"]) ** 2)
        loss += t.lambda_alphas * jnp.mean(jnp.abs(results_["alphas"] - batch["alphas"]))
        loss += t.lambda_alphas * jnp.mean(jnp.abs(results_["alphas_fine"] - batch["alphas"]))
        scale = 2.0 / c.n_samples
        for fine in (False, True):
            s = system.scene.query_sigma(params["anim_nerf"], batch["fg_points"], use_fine=fine)
            loss += t.lambda_foreground * jnp.mean(jnp.exp(-scale * jax.nn.relu(s)))
            s = system.scene.query_sigma(params["anim_nerf"], batch["bg_points"], use_fine=fine)
            loss += t.lambda_background * jnp.mean(1.0 - jnp.exp(-scale * jax.nn.relu(s)))
        return loss, {"loss": loss}

    results["no_normals"] = timed(step_of(loss_no_normals), batches, state, key)

    # 3. rgb+alpha losses only (no fg/bg sigma passes either)
    def loss_rgba_only(params, batch, k):
        c = system.cfg
        from animnerf_tpu.models.body_params import (
            batch_params_from_data,
            lookup_body_params,
        )

        frame_idx = batch["frame_idx"]
        body_params = lookup_body_params(params["body_params"], frame_idx)
        body_tmpl = batch_params_from_data(batch, c.model_type, template=True)
        k_render, _ = jax.random.split(k)
        results_, ctx = system.render(params, body_params, body_tmpl,
                                      batch["rays"], frame_idx, perturb=1.0,
                                      key=k_render)
        t = c.train
        loss = jnp.mean((results_["rgbs"] - batch["rgbs"]) ** 2)
        loss += jnp.mean((results_["rgbs_fine"] - batch["rgbs"]) ** 2)
        loss += t.lambda_alphas * jnp.mean(jnp.abs(results_["alphas"] - batch["alphas"]))
        loss += t.lambda_alphas * jnp.mean(jnp.abs(results_["alphas_fine"] - batch["alphas"]))
        return loss, {"loss": loss}

    results["rgba_only"] = timed(step_of(loss_rgba_only), batches, state, key)

    # 4. frozen body params (no FK backward; FK fwd still runs)
    def loss_frozen_body(params, batch, k):
        p = dict(params)
        p["body_params"] = jax.tree.map(jax.lax.stop_gradient, params["body_params"])
        return loss_rgba_only(p, batch, k)

    results["rgba_frozen_body"] = timed(step_of(loss_frozen_body), batches, state, key)

    # 5. FK alone: prepare_frame fwd+bwd at full V
    from animnerf_tpu.models.body_params import (
        batch_params_from_data,
        lookup_body_params,
    )
    from animnerf_tpu.models.warp import prepare_frame

    def fk_loss(params, batch, k):
        frame_idx = batch["frame_idx"]
        body_params = lookup_body_params(params["body_params"], frame_idx)
        body_tmpl = batch_params_from_data(batch, system.cfg.model_type,
                                           template=True)
        ctx = prepare_frame(system.body_model, body_params, body_tmpl)
        loss = (jnp.sum(ctx.verts) * 1e-6 + jnp.sum(ctx.ober2cano) * 1e-6
                + jnp.sum(ctx.verts_template) * 1e-6)
        return loss, {"loss": loss}

    results["fk_only"] = timed(step_of(fk_loss), batches, state, key)

    # 6. normal losses alone (query_normal x4 + adam)
    def normals_loss(params, batch, k):
        frame_idx = batch["frame_idx"]
        body_params = lookup_body_params(params["body_params"], frame_idx)
        body_tmpl = batch_params_from_data(batch, system.cfg.model_type,
                                           template=True)
        ctx = prepare_frame(system.body_model, body_params, body_tmpl)
        c = system.cfg
        t = c.train
        k1, k2 = jax.random.split(k)
        pts = jax.lax.stop_gradient(ctx.verts_template)
        pts = pts + jax.random.normal(k1, pts.shape) * (c.dis_threshold * 0.5)
        neighbs = pts + jax.random.normal(k2, pts.shape) * t.epsilon
        loss = 0.0
        for fine in (False, True):
            n1 = system.scene.query_normal(params["anim_nerf"], pts, use_fine=fine)
            n2 = system.scene.query_normal(params["anim_nerf"], neighbs, use_fine=fine)
            n1 = S._safe_normalize(n1)
            n2 = S._safe_normalize(n2)
            loss += t.lambda_normals * jnp.mean((n1 - n2) ** 2)
        return loss, {"loss": loss}

    results["fk_plus_normals"] = timed(step_of(normals_loss), batches, state, key)

    full = results["full"]
    print(f"{'variant':24s} {'ms':>8s}  {'delta vs full (ms)':>18s}")
    for k_, v in results.items():
        print(f"{k_:24s} {v * 1e3:8.1f}  {(full - v) * 1e3:18.1f}")


if __name__ == "__main__":
    main()
