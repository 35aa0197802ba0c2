"""Multi-chip correctness: sharded training/eval must equal single-device.

The property being tested is the one PyTorch-Lightning gave the reference
for free (/root/reference/train.py:451-458): data-parallel training over N
devices computes the SAME parameter trajectory as 1-device training on the
same batch — the psum gradient all-reduce is exact up to float reduction
order. Runs on the 8-device virtual CPU mesh from conftest.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from __graft_entry__ import _flagship_system, _rays
from animnerf_tpu.models.body_params import init_body_params
from animnerf_tpu.parallel.mesh import make_mesh, shard_batch
from animnerf_tpu.parallel.train_pjit import (
    make_sharded_eval_step,
    make_sharded_train_step,
)
from animnerf_tpu.training.checkpoints import (
    load_train_state,
    save_train_state,
)


def _tiny_setup(B=8, n_rays=32, seed=0):
    cfg, system, params_for, num_joints = _flagship_system(tiny=True)
    rng_np = np.random.default_rng(seed)
    tmpl = {k: np.array(v) for k, v in params_for(2, B).items()}
    tmpl["transl"] = np.zeros_like(tmpl["transl"])
    obs = {k: np.array(v) for k, v in params_for(3 + seed, B).items()}
    batch = {
        **obs,
        "frame_idx": np.arange(B, dtype=np.int32) % cfg.num_frames,
        "rays": _rays(B, n_rays),
        "rgbs": rng_np.uniform(size=(B, n_rays, 3)).astype(np.float32),
        "alphas": rng_np.uniform(size=(B, n_rays, 1)).astype(np.float32),
        "fg_points": rng_np.normal(scale=0.2, size=(B, 16, 3)).astype(np.float32),
        "bg_points": rng_np.normal(scale=0.8, size=(B, 16, 3)).astype(np.float32),
        **{k + "_template": v for k, v in tmpl.items()},
    }
    return cfg, system, num_joints, batch


def _run_steps(system, num_joints, cfg, batches, n_devices, n_steps):
    mesh = make_mesh(n_devices)
    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames,
                                   pose_dim=3 * (num_joints - 1))
    state = system.init_state(rng, body_params, steps_per_epoch=10)
    tx = system.make_optimizer(steps_per_epoch=10)
    train_step, place_state, place_batch = make_sharded_train_step(
        system, tx, mesh)
    state = place_state(state)
    metrics = None
    for i in range(n_steps):
        state, metrics = train_step(state, place_batch(batches[i]),
                                    jax.random.PRNGKey(7))
    return jax.device_get(state), jax.device_get(metrics)


def _grads_on_mesh(system, params, batch, n_dev):
    from animnerf_tpu.parallel.mesh import batch_sharding, replicated

    grad_fn = jax.value_and_grad(system.loss_fn, has_aux=True)
    mesh = make_mesh(n_dev)
    jitted = jax.jit(grad_fn,
                     in_shardings=(replicated(mesh), batch_sharding(mesh),
                                   replicated(mesh)),
                     out_shardings=replicated(mesh))
    b = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    (loss, _), grads = jitted(jax.device_put(params, replicated(mesh)),
                              b, jax.random.PRNGKey(7))
    return float(loss), jax.device_get(grads)


def _assert_grads_close(g_ref, g_new, tol, what):
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_new = jax.tree_util.tree_leaves(g_new)
    assert len(flat_ref) == len(flat_new)
    for (path, a), b in zip(flat_ref, flat_new):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num = float(np.linalg.norm((a - b).ravel()))
        den = float(np.linalg.norm(a.ravel())) + 1e-12
        assert num / den < tol, (
            f"{what}: grad rel-L2 {num / den:.2e} at "
            f"{jax.tree_util.keystr(path)}")


@pytest.mark.slow
def test_grads_mesh_size_equivalence():
    """Gradients must be invariant to the mesh size: the psum over 8 shards
    must reproduce the 2-shard (and, coarsely, 1-device) gradients.

    Multi-device meshes run shard_map with per-shard local means + an
    explicit pmean, so the gradient reduction TREE differs with the shard
    count: 2-dev vs 8-dev agree to reduction-order noise (measured
    ~2e-4 rel-L2; tested at 1e-3). The UNsharded 1-device program
    additionally compiles to different fp contraction/fusion choices
    (measured ~4e-3 rel-L2 on the rodrigues/FK-heavy body_pose grads) —
    tested coarse at 2e-2. Both bounds still catch any real psum/sharding
    bug, which is O(1) relative (grads scaled by 1/n_devices). Training
    NOISE, by contrast, is exactly mesh-invariant (per-element keys,
    utils/rng.py) — asserted bit-tight by the SGD trajectory test."""
    cfg, system, num_joints, batch = _tiny_setup()
    rng = jax.random.PRNGKey(0)
    params = system.init_params(
        rng, init_body_params(cfg.num_frames, pose_dim=3 * (num_joints - 1)))

    l1, g1 = _grads_on_mesh(system, params, batch, 1)
    l2, g2 = _grads_on_mesh(system, params, batch, 2)
    l8, g8 = _grads_on_mesh(system, params, batch, 8)

    assert abs(l2 - l8) < 1e-5 * (1 + abs(l2))
    assert abs(l1 - l8) < 1e-4 * (1 + abs(l1))
    _assert_grads_close(g2, g8, 1e-3, "2dev-vs-8dev")
    _assert_grads_close(g1, g8, 2e-2, "1dev-vs-8dev")


@pytest.mark.slow
def test_train_1dev_vs_8dev_param_equivalence_sgd():
    """k SGD steps on 1 device == on 8 devices from identical init: with a
    linear optimizer the parameter trajectory itself must match (Adam's
    g/(sqrt(v)+eps) amplifies reduction-order noise on ~zero gradients to
    ±lr, so the trajectory property is only well-posed for SGD; the Adam
    path is covered by the gradient-equivalence test above)."""
    cfg, system, num_joints, _ = _tiny_setup()
    cfg.train.optimizer.type = "sgd"
    cfg.train.optimizer.momentum = 0.9
    from animnerf_tpu.training.system import AnimNeRFSystem

    system = AnimNeRFSystem(cfg, system.body_model)
    batches = [_tiny_setup(seed=s)[3] for s in range(3)]

    s1, m1 = _run_steps(system, num_joints, cfg, batches, 1, 3)
    s8, m8 = _run_steps(system, num_joints, cfg, batches, 8, 3)

    assert abs(m1["loss"] - m8["loss"]) < 1e-4

    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves8 = jax.tree_util.tree_leaves(s8.params)
    assert len(leaves1) == len(leaves8)
    worst = 0.0
    for a, b in zip(leaves1, leaves8):
        worst = max(worst, float(np.max(np.abs(np.asarray(a, np.float32)
                                               - np.asarray(b, np.float32)))))
    assert worst < 1e-5, f"1-dev vs 8-dev param divergence {worst}"


def test_sharded_eval_matches_single_device():
    cfg, system, num_joints, batch = _tiny_setup()
    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames,
                                   pose_dim=3 * (num_joints - 1))
    params = system.init_params(rng, body_params)

    eval_batch = dict(batch)
    out8 = make_sharded_eval_step(system, make_mesh(8))(params, eval_batch)
    out1 = make_sharded_eval_step(system, make_mesh(1))(params, eval_batch)
    for k in out1:
        np.testing.assert_allclose(np.asarray(out8[k]), np.asarray(out1[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def test_sharded_eval_step_jit_is_cached():
    """Repeated eval calls must reuse one jitted program per batch structure
    (VERDICT.md round-1: make_sharded_eval_step re-jitted every call)."""
    cfg, system, num_joints, batch = _tiny_setup()
    rng = jax.random.PRNGKey(0)
    params = system.init_params(
        rng, init_body_params(cfg.num_frames, pose_dim=3 * (num_joints - 1)))
    step = make_sharded_eval_step(system, make_mesh(8))
    step(params, dict(batch))
    step(params, dict(batch))
    # different slab shape, same structure: same cache entry (jit's own
    # shape cache handles the retrace)
    half = {k: (v[:, :16] if getattr(v, "ndim", 0) >= 2
                and k in ("rays", "rgbs", "alphas") else v)
            for k, v in batch.items()}
    step(params, half)
    assert len(step._cache) == 1


@pytest.mark.slow
def test_checkpoint_save_restore_under_sharding(tmp_path):
    """save -> restore -> continue on the 8-device mesh must equal training
    straight through (full-state fidelity incl. optimizer + step counter)."""
    cfg, system, num_joints, _ = _tiny_setup()
    batches = [_tiny_setup(seed=s)[3] for s in range(2)]
    mesh = make_mesh(8)

    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames,
                                   pose_dim=3 * (num_joints - 1))
    tx = system.make_optimizer(steps_per_epoch=10)
    train_step, place_state, place_batch = make_sharded_train_step(
        system, tx, mesh)

    # straight-through trajectory
    state = place_state(system.init_state(rng, body_params,
                                          steps_per_epoch=10))
    state, _ = train_step(state, place_batch(batches[0]), jax.random.PRNGKey(7))
    ref = jax.device_get(state)
    state, _ = train_step(state, place_batch(batches[1]), jax.random.PRNGKey(7))
    ref2 = jax.device_get(state)

    # save the sharded state after step 1, restore, continue
    path = str(tmp_path / "ckpt")
    save_train_state(path, ref)
    target = system.init_state(rng, body_params, steps_per_epoch=10)
    restored = load_train_state(path, target)
    assert int(restored.step) == 1
    restored = place_state(restored)
    restored, _ = train_step(restored, place_batch(batches[1]),
                             jax.random.PRNGKey(7))
    restored = jax.device_get(restored)

    for a, b in zip(jax.tree_util.tree_leaves(ref2.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(ref2.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
