"""Exactness of the rows-native compacted step (render/compact_rows.py +
training/system.py::RowsCompactTrainer) against the dense rows pipeline.

Same contract as test_compact_train.py, but for the fast trainer: both
render passes compacted (conservative boxes pre-pass before the kNN,
exact blended-dist select before the merged fine MLP), all on the fused
kernel pipeline (interpret mode here via test_rows_pipeline's forcing).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from test_parallel import _tiny_setup  # noqa: E402
from test_rows_pipeline import rows_path_forced  # noqa: E402

from animnerf_tpu.models.body_params import init_body_params  # noqa: E402
from animnerf_tpu.training.system import AnimNeRFSystem  # noqa: E402


def _setup(seed=0, B=2, n_rays=16, sgd=False):
    cfg, system, num_joints, batch = _tiny_setup(seed=seed, B=B,
                                                 n_rays=n_rays)
    if sgd:
        cfg.train.optimizer.type = "sgd"
        cfg.train.optimizer.momentum = 0.9
        system = AnimNeRFSystem(cfg, system.body_model)
    rng = jax.random.PRNGKey(0)
    body_params = init_body_params(cfg.num_frames,
                                   pose_dim=3 * (num_joints - 1))
    state = system.init_state(rng, body_params, steps_per_epoch=10)
    tx = system.make_optimizer(steps_per_epoch=10)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, system, state, tx, batch


def _full_cap(cfg, n_rays):
    """Capacity = the dense coarse size: nothing can overflow, every
    survivor is kept — isolates compaction bookkeeping from capacity
    effects."""
    return n_rays * cfg.n_samples


@pytest.mark.slow
def test_rows_compact_loss_matches_dense_rows():
    cfg, system, state, tx, batch = _setup()
    key = jax.random.PRNGKey(7)
    cap_c = _full_cap(cfg, batch["rays"].shape[1])

    with rows_path_forced():
        system.scene.__dict__["use_fused_mlp"] = True
        assert system.rows_compaction_applicable()
        _, d1 = system.loss_fn(state.params, batch,
                               jax.random.fold_in(key, state.step))
        _, d2 = system.rows_compact_loss_fn(state.params, batch, key,
                                            state.step, cap_c=cap_c)
    assert int(d2["compact_overflow"]) == 0
    for k in d1:
        np.testing.assert_allclose(np.asarray(d1[k]), np.asarray(d2[k]),
                                   rtol=2e-6, err_msg=k)


@pytest.mark.slow
def test_rows_compact_counts_are_exact():
    """compact_count must equal an independent dense count of the boxes
    pre-pass — it drives the trainer's capacity ladder."""
    from animnerf_tpu.models.body_params import (
        batch_params_from_data,
        lookup_body_params,
    )
    from animnerf_tpu.models.warp import prepare_frame, rays_to_root_frame
    from animnerf_tpu.ops.knn import keep_within_boxes, min_vertex_distance
    from animnerf_tpu.render.volume_renderer import sample_coarse

    cfg, system, state, tx, batch = _setup()
    key = jax.random.PRNGKey(7)
    cap_c = _full_cap(cfg, batch["rays"].shape[1])

    with rows_path_forced():
        system.scene.__dict__["use_fused_mlp"] = True
        _, d = system.rows_compact_loss_fn(state.params, batch, key,
                                           state.step, cap_c=cap_c)

        bp = lookup_body_params(state.params["body_params"],
                                batch["frame_idx"])
        btm = batch_params_from_data(batch, cfg.model_type, template=True)
        ctx = prepare_frame(system.body_model, bp, btm)
        rays_root = rays_to_root_frame(ctx, batch["rays"])
        from animnerf_tpu.utils import rng as prng

        folded = jax.random.fold_in(key, state.step)
        keys = prng.elem_keys(folded, batch["rays"].shape[0])
        k_render, _ = prng.split_keys(keys, 2)
        k_coarse, *_ = prng.split_keys(k_render, 5)
        z_c = sample_coarse(system.renderer_cfg, rays_root, 1.0, k_coarse)
        B, R, Kc = z_c.shape
        xyz = (rays_root[..., None, 0:3]
               + z_c[..., None] * rays_root[..., None, 3:6]
               ).reshape(B, R * Kc, 3)
        bv = ctx.verts_morton if ctx.verts_morton is not None else ctx.verts
        keep = keep_within_boxes(xyz, bv, system.scene_cfg.dis_threshold)
        want = int(jnp.max(jnp.sum(keep, axis=1)))
    assert int(d["compact_count"]) == want


@pytest.mark.slow
def test_rows_compact_grads_match_dense_rows():
    cfg, system, state, tx, batch = _setup()
    key = jax.random.PRNGKey(7)
    step = state.step
    cap_c = _full_cap(cfg, batch["rays"].shape[1])

    with rows_path_forced():
        system.scene.__dict__["use_fused_mlp"] = True
        (_, _), g_dense = jax.value_and_grad(system.loss_fn, has_aux=True)(
            state.params, batch, jax.random.fold_in(key, step))
        (_, d), g_comp = jax.value_and_grad(
            partial(system.rows_compact_loss_fn, cap_c=cap_c),
            has_aux=True)(state.params, batch, key, step)
    assert int(d["compact_overflow"]) == 0

    flat_d = jax.tree_util.tree_leaves_with_path(g_dense)
    flat_c = jax.tree_util.tree_leaves(g_comp)
    assert len(flat_d) == len(flat_c)
    for (path, a), b in zip(flat_d, flat_c):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        num = float(np.linalg.norm((a - b).ravel()))
        den = float(np.linalg.norm(a.ravel()))
        # same hybrid bound as test_compact_train: compacted sums reorder
        # fp reductions of near-zero per-sample contributions
        if den < 1e-12:
            assert num < 1e-9, jax.tree_util.keystr(path)
        else:
            assert num < 1e-8 or num / den < 2e-3, (
                f"grad rel-L2 {num / den:.2e} (abs {num:.2e}) at "
                f"{jax.tree_util.keystr(path)}")
    gb = g_dense["body_params"]["body_pose"]
    assert float(jnp.max(jnp.abs(gb))) > 0


@pytest.mark.slow
def test_rows_compact_overflow_detected_and_rerun():
    """Undersized capacities must (a) be reported via compact_overflow and
    (b) make the strict trainer re-run at a larger rung so the resulting
    step equals the amply-capped one."""
    cfg, system, state, tx, batch = _setup()
    key = jax.random.PRNGKey(7)
    cap_c = _full_cap(cfg, batch["rays"].shape[1])

    with rows_path_forced():
        system.scene.__dict__["use_fused_mlp"] = True
        _, d_tiny = system.rows_compact_loss_fn(
            state.params, batch, key, state.step, cap_c=8)
        assert int(d_tiny["compact_overflow"]) == 1

        trainer = system.make_rows_compact_trainer(tx, quantum=16)
        # sabotage the primer so the first run definitely overflows
        trainer._prime_cap = lambda batch: 16
        s1, d1 = trainer.step(state, batch, key)
        assert trainer.overflows >= 1
        assert int(d1["compact_overflow"]) == 0  # the re-run was exact

        big = system.make_rows_compact_trainer(tx, quantum=cap_c)
        s2, d2 = big.step(state, batch, key)
    np.testing.assert_allclose(float(d1["loss"]), float(d2["loss"]),
                               rtol=1e-6)
    for (pa, a), b in zip(jax.tree_util.tree_leaves_with_path(s1.params),
                          jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow
def test_rows_trainer_sgd_trajectory_matches_dense():
    """3 SGD steps rows-compact == dense rows path to float tolerance (SGD
    because Adam amplifies reduction-order noise on ~zero gradients)."""
    cfg, system, state, tx, batch = _setup(sgd=True)
    key = jax.random.PRNGKey(7)

    with rows_path_forced():
        system.scene.__dict__["use_fused_mlp"] = True
        dense = system.make_train_step(tx)
        sd = state
        for _ in range(3):
            sd, dd = dense(sd, batch, key)

        trainer = system.make_rows_compact_trainer(tx, quantum=32)
        sc = state
        for _ in range(3):
            sc, dc = trainer.step(sc, batch, key)

    np.testing.assert_allclose(float(dd["loss"]), float(dc["loss"]),
                               rtol=5e-5)
    for (pa, a), b in zip(jax.tree_util.tree_leaves_with_path(sd.params),
                          jax.tree_util.tree_leaves(sc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow
def test_rows_trainer_mesh_size_equivalence_sgd():
    """The rows-compacted trainer composes with the data-parallel mesh:
    3 SGD steps on 1 device == on 8 devices from identical init (the same
    trajectory property tests/test_parallel.py asserts for the dense
    sharded step — VERDICT r4 ask 3). Each shard compacts locally at one
    device-uniform capacity rung; grads pmean, counts pmax."""
    from animnerf_tpu.parallel.mesh import make_mesh

    def run(n_dev):
        # B=8 so the batch splits over the 8-device mesh
        cfg, system, state, tx, batch = _setup(B=8, n_rays=8, sgd=True)
        mesh = make_mesh(n_dev)
        from animnerf_tpu.parallel.mesh import batch_sharding, replicated

        with rows_path_forced():
            system.scene.__dict__["use_fused_mlp"] = True
            assert system.rows_compaction_applicable()
            trainer = system.make_rows_compact_trainer(
                tx, quantum=32, mesh=mesh)
            st = jax.device_put(state, replicated(mesh))
            m = None
            for _ in range(3):
                b = jax.device_put(batch, batch_sharding(mesh))
                st, m = trainer.step(st, b, jax.random.PRNGKey(7))
        return jax.device_get(st), jax.device_get(m), trainer

    s1, m1, t1 = run(1)
    s8, m8, t8 = run(8)
    # same capacity ladder on both topologies (the 8-dev pmax count must
    # equal the 1-dev global count)
    assert t1._cap == t8._cap
    assert int(m1["compact_count"]) == int(m8["compact_count"])
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4

    for (pa, a), b in zip(jax.tree_util.tree_leaves_with_path(s1.params),
                          jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_sharded_trainer_selects_engine():
    """make_sharded_trainer picks the rows engine exactly when the config
    supports it: dense on plain CPU (no fused kernels), rows under the
    forced kernel path; ANIMNERF_TRAINER=dense always opts out."""
    import os

    from animnerf_tpu.parallel.mesh import make_mesh
    from animnerf_tpu.parallel.train_pjit import make_sharded_trainer

    cfg, system, state, tx, batch = _setup()
    mesh = make_mesh(1)

    # plain CPU: rows path unavailable -> dense
    assert not system.rows_compaction_applicable()
    step, _, _ = make_sharded_trainer(system, tx, mesh)
    assert not hasattr(step, "__self__")  # a jitted fn, not a bound method

    with rows_path_forced():
        system.scene.__dict__["use_fused_mlp"] = True
        assert system.rows_compaction_applicable()
        from animnerf_tpu.training.system import RowsCompactTrainer

        step, _, _ = make_sharded_trainer(system, tx, mesh)
        assert isinstance(getattr(step, "__self__", None), RowsCompactTrainer)

        old = os.environ.get("ANIMNERF_TRAINER")
        os.environ["ANIMNERF_TRAINER"] = "dense"
        try:
            step, _, _ = make_sharded_trainer(system, tx, mesh)
            assert not hasattr(step, "__self__")
        finally:
            if old is None:
                del os.environ["ANIMNERF_TRAINER"]
            else:
                os.environ["ANIMNERF_TRAINER"] = old


def test_rows_compact_bookkeeping_matches_dense_closures():
    """Fast default-suite check of the compaction BOOKKEEPING alone
    (select / gather / scatter / fills / lane merge / dual counts) against
    render_rays_rows on plain-XLA warp/field closures — no Pallas kernels,
    so it runs in seconds on CPU. The kernel-pipeline equivalence is
    covered by the slow tests above."""
    from animnerf_tpu.render.compact_rows import render_rays_rows_compact
    from animnerf_tpu.render.volume_renderer import (
        RendererConfig,
        render_rays_rows,
    )

    B, R = 2, 8
    thr = 0.5
    cfg = RendererConfig(n_coarse=12, n_fine=6, white_bkgd=True)
    rng = np.random.default_rng(0)
    o = rng.normal(scale=0.1, size=(B, R, 3)).astype(np.float32)
    o[..., 2] += 3.0
    d = -o + rng.normal(scale=0.05, size=o.shape).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((B, R, 1), 0.1, np.float32),
         np.full((B, R, 1), 6.0, np.float32)], axis=-1))

    w = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))

    def warp_rows_fn(xyz_t):
        # deterministic fake warp: offset coords, bd = distance to origin
        # minus a learned-ish dot (keeps bd continuous and sign-varied)
        x, y, z = xyz_t[:, 0], xyz_t[:, 1], xyz_t[:, 2]
        bd = jnp.sqrt(x * x + y * y + z * z) - 2.6 + 0.01 * (
            w[0] * x + w[1] * y + w[2] * z)
        out = [x * 1.1 + 0.2, y * 0.9, z + 0.1, bd]
        return jnp.stack(out + [jnp.zeros_like(x)] * 4, axis=1)

    def field_rows_fn(rows, fine):
        x, y, z, bd = rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]
        s = 3.0 * jnp.cos(x + y) + (1.5 if fine else 1.0) * z
        sigma = jnp.where(bd < thr, s, -1e5)
        rgb = [jnp.tanh(x), jnp.tanh(y * 2), jnp.tanh(z - x)]
        return jnp.stack(rgb + [sigma] + [jnp.zeros_like(x)] * 4, axis=1)

    def keep_rows_fn(rows):
        # conservative superset of bd < thr for THIS fake warp: radius
        # test with slack covering the 0.01*w dot term
        x, y, z = rows[:, 0], rows[:, 1], rows[:, 2]
        xx, yy, zz = x * 1.1 + 0.2, y * 0.9, z + 0.1
        r = jnp.sqrt(xx * xx + yy * yy + zz * zz)
        return r - 2.6 < thr + 0.2

    key = jax.random.PRNGKey(3)
    for perturb in (0.0, 1.0):
        dense = render_rays_rows(cfg, warp_rows_fn, field_rows_fn, rays,
                                 perturb=perturb, key=key)
        comp, n_c = render_rays_rows_compact(
            cfg, warp_rows_fn, field_rows_fn, rays,
            cap_c=R * cfg.n_coarse,
            keep_rows_fn=keep_rows_fn, perturb=perturb, key=key)
        assert 0 < int(n_c) <= R * cfg.n_coarse
        assert dense.keys() == comp.keys()
        for k in dense:
            np.testing.assert_allclose(np.asarray(dense[k]),
                                       np.asarray(comp[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

        # a tight capacity must flag (the count is capacity-independent),
        # not crash
        _, n_c2 = render_rays_rows_compact(
            cfg, warp_rows_fn, field_rows_fn, rays, cap_c=4,
            keep_rows_fn=keep_rows_fn, perturb=perturb, key=key)
        assert int(n_c2) == int(n_c)

        # a capacity ABOVE the dense size (the trainer's quantum ladder can
        # overshoot on small configs) must clamp to the pure-permutation
        # cap == N program, not crash in compact/expand_channels (ADVICE r4)
        over, n_c3 = render_rays_rows_compact(
            cfg, warp_rows_fn, field_rows_fn, rays,
            cap_c=R * cfg.n_coarse + 37,
            keep_rows_fn=keep_rows_fn, perturb=perturb, key=key)
        assert int(n_c3) == int(n_c)
        for k in dense:
            np.testing.assert_allclose(np.asarray(dense[k]),
                                       np.asarray(over[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_rows_compact_morton_matches_dense_rows(monkeypatch):
    """The Morton-ordered compaction (survivors sorted spatially for the
    kNN vertex-tile skip) must match the dense rows step like the
    ray-ordered compaction does. Only float accumulation order (weight
    grads summed over a permuted lane order) may differ — hence the
    slightly looser grad tolerance than the bit-for-bit ray-order test."""
    monkeypatch.setenv("ANIMNERF_MORTON_COMPACT", "1")
    cfg, system, state, tx, batch = _setup()
    key = jax.random.PRNGKey(7)
    cap_c = _full_cap(cfg, batch["rays"].shape[1])

    with rows_path_forced():
        system.scene.__dict__["use_fused_mlp"] = True
        _, d1 = system.loss_fn(state.params, batch,
                               jax.random.fold_in(key, state.step))
        _, d2 = system.rows_compact_loss_fn(state.params, batch, key,
                                            state.step, cap_c=cap_c)

        g1 = jax.grad(lambda p: system.loss_fn(
            p, batch, jax.random.fold_in(key, state.step))[0])(state.params)
        g2 = jax.grad(lambda p: system.rows_compact_loss_fn(
            p, batch, key, state.step, cap_c=cap_c)[0])(state.params)
    assert int(d2["compact_overflow"]) == 0
    for k in d1:
        np.testing.assert_allclose(np.asarray(d1[k]), np.asarray(d2[k]),
                                   rtol=5e-6, err_msg=k)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, v1 in flat1:
        v2 = flat2[path]
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
