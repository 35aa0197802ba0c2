"""Sharded training / rendering programs (pjit).

Builds the jitted multi-chip step functions: parameters replicated, batches
sharded over the mesh 'data' axis; XLA inserts the gradient all-reduce over
ICI (SURVEY.md §2.8's TPU-native equivalent of Lightning DP/DDP).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from animnerf_tpu.parallel.mesh import (
    batch_sharding,
    ray_sharding,
    replicated,
)
from animnerf_tpu.training.system import AnimNeRFSystem, TrainState


def make_sharded_train_step(system: AnimNeRFSystem, tx, mesh: Mesh):
    """Shard the train step over `mesh`'s 'data' axis.

    Multi-device meshes use jax.shard_map with an EXPLICIT gradient pmean
    over ICI — the scaling-book data-parallel recipe — rather than
    GSPMD-propagated shardings: every chip runs the full step (including
    the Pallas kernels, which a GSPMD partitioner would have to
    re-derive sharding rules for or replicate with all-gathers) on its
    local batch shard, and only the gradients/metrics cross the
    interconnect. Single-device meshes keep the plain jit.

    Returns (train_step, place_state, place_batch):
      train_step(state, batch, key) -> (state, metrics)
      place_state(state) -> state replicated on the mesh
      place_batch(host_batch) -> batch sharded on the 'data' axis
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    if mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        def local_step(state: TrainState, batch: dict, key: jax.Array):
            key = jax.random.fold_in(key, state.step)
            # per-element noise keyed by GLOBAL index: identical draws on
            # any mesh size (see utils/rng.py)
            offset = jax.lax.axis_index("data") * batch["rays"].shape[0]
            grad_fn = jax.value_and_grad(system.loss_fn, has_aux=True)
            (loss, details), grads = grad_fn(state.params, batch, key,
                                             offset)
            # equal shard sizes: the global batch-mean gradient is the
            # mean of per-shard means
            grads = jax.lax.pmean(grads, "data")
            details = jax.lax.pmean(details, "data")
            import optax as _optax

            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = _optax.apply_updates(state.params, updates)
            return (TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state), details)

        sm = jax.shard_map(local_step, mesh=mesh,
                           in_specs=(P(), P("data"), P()),
                           out_specs=(P(), P()),
                           check_vma=False)
        jitted = jax.jit(sm, donate_argnums=(0,))
    else:
        step = system.make_train_step(tx)
        jitted = jax.jit(
            step,
            in_shardings=(rep, bsh, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )

    def place_state(state: TrainState) -> TrainState:
        return jax.device_put(state, rep)

    def place_batch(batch: dict) -> dict:
        return jax.device_put(batch, bsh)

    return jitted, place_state, place_batch


def make_sharded_trainer(system: AnimNeRFSystem, tx, mesh: Mesh,
                         engine: Optional[str] = None):
    """The product training engine: the fastest EXACT trainer the config
    supports, sharded over `mesh`'s 'data' axis.

    Selection (engine=None / 'auto'; ANIMNERF_TRAINER overrides):
      'rows'   — the rows-native compacted trainer (boxes pre-pass before
                 the kNN + compacted merged fine MLP on the fused kernel
                 pipeline; loss/grad/SGD-trajectory equal to dense —
                 tests/test_compact_rows.py, 84.0k vs 66.9k rays/s dense
                 on-chip, PERF.md round 4). Picked whenever the config
                 supports it (TPU, kNN unpose, no latent codes, K <= 128).
      'compact'— the point-major compacted trainer (wins only in sparse-
                 survivor regimes; opt-in).
      'dense'  — the single-program dense step (the fallback; also what
                 non-flagship configs — DeRF, latent codes, K > 128 —
                 always get).

    Returns (step, place_state, place_batch) with the same contract as
    make_sharded_train_step; multi-device meshes run each engine under
    shard_map with gradient pmean over ICI (compacted engines pmax their
    survivor counts so the host-side capacity ladder sees the worst
    shard — see training/system.py::CompactTrainer).
    """
    import os

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    if engine is None:
        engine = os.environ.get("ANIMNERF_TRAINER", "auto")
    if engine == "auto":
        engine = "rows" if system.rows_compaction_applicable() else "dense"
    print(f"trainer engine: {engine} "
          f"(compute_dtype={system.scene_cfg.compute_dtype}, "
          f"remat={system.scene_cfg.remat}, "
          f"mesh={int(mesh.devices.size)}dev)", flush=True)

    if engine == "dense":
        return make_sharded_train_step(system, tx, mesh)

    # pipelined: no per-step host<->device count read-back (this matters on
    # tunneled/remote chips where a sync costs ~130 ms); counts poll
    # asynchronously with a capacity margin + overflow ratchet
    if engine == "rows":
        trainer = system.make_rows_compact_trainer(tx, pipelined=True,
                                                   mesh=mesh)
    elif engine == "compact":
        trainer = system.make_compact_trainer(tx, pipelined=True, mesh=mesh)
    else:
        raise ValueError(f"unknown trainer engine {engine!r}")

    def place_state(state):
        return jax.device_put(state, rep)

    def place_batch(batch):
        return jax.device_put(batch, bsh)

    return trainer.step, place_state, place_batch


def make_sharded_eval_step(system: AnimNeRFSystem, mesh: Mesh):
    """Full-frame rendering with the *ray* axis sharded: a 512^2 frame is one
    program over n_chips, replacing the reference's chunk loop.

    The jitted program is cached per batch *structure* (key set + per-key
    ndim — the only inputs the sharding layout depends on); repeated calls
    with new slab shapes hit jax.jit's own shape cache instead of rebuilding
    a fresh jit wrapper every call."""
    step = system.make_eval_step()
    rep = replicated(mesh)
    rsh = ray_sharding(mesh)
    cache: dict = {}

    def batch_shardings(batch: dict):
        out = {}
        for k, v in batch.items():
            if k in ("rays", "rgbs", "alphas") and getattr(v, "ndim", 0) >= 2:
                out[k] = rsh
            else:
                out[k] = rep
        return out

    def eval_step(params, batch):
        key = tuple(sorted((k, getattr(v, "ndim", 0))
                           for k, v in batch.items()))
        if key not in cache:
            shardings = batch_shardings(batch)
            if mesh.size > 1:
                # shard_map: each chip renders its ray shard through the
                # full pipeline (incl. Pallas kernels) — see
                # make_sharded_train_step for why this beats GSPMD here
                from jax.sharding import PartitionSpec as P

                specs = {k: (P(None, "data") if s is rsh else P())
                         for k, s in shardings.items()}
                sm = jax.shard_map(step, mesh=mesh, in_specs=(P(), specs),
                                   out_specs=P(None, "data"),
                                   check_vma=False)
                jitted = jax.jit(sm)
            else:
                jitted = jax.jit(step, in_shardings=(rep, shardings),
                                 out_shardings=rsh)
            cache[key] = (jitted, shardings)
        jitted, shardings = cache[key]
        batch = jax.device_put(batch, shardings)
        return jitted(params, batch)

    eval_step._cache = cache  # exposed for tests
    return eval_step
