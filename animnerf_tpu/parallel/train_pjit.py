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
    """jit the train step with explicit shardings over `mesh`.

    Returns (train_step, place_state, place_batch):
      train_step(state, batch, key) -> (state, metrics)
      place_state(state) -> state replicated on the mesh
      place_batch(host_batch) -> batch sharded on the 'data' axis
    """
    step = system.make_train_step(tx)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

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
            cache[key] = (
                jax.jit(step, in_shardings=(rep, shardings),
                        out_shardings=rsh),
                shardings,
            )
        jitted, shardings = cache[key]
        batch = jax.device_put(batch, shardings)
        return jitted(params, batch)

    eval_step._cache = cache  # exposed for tests
    return eval_step
