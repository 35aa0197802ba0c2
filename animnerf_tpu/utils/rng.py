"""Per-batch-element PRNG streams — topology-invariant training noise.

Drawing a (B, ...) noise tensor from ONE key makes the values depend on
how the batch is laid out: under data-parallel shard_map each device
would draw its local (B/n, ...) shard from the same key, so the noise a
given sample sees changes with the mesh size. Instead every batch
element gets its own key, folded from (base key, GLOBAL element index):
draws are identical on 1 chip, 8 chips, or a pod, and the
mesh-size-equivalence tests assert trajectory equality, not merely
distributional equivalence.

A "key" here is either a classic (2,) uint32 PRNG key (one stream) or a
(B, 2) array of per-element keys; every helper accepts both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elem_keys(key: jax.Array, batch_size: int,
              global_offset=0) -> jax.Array:
    """(2,) base key -> (B, 2) per-element keys folded with the GLOBAL
    element index (global_offset + local position)."""
    ids = global_offset + jnp.arange(batch_size)
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(ids)


def split_keys(key: jax.Array, n: int):
    """split() that preserves single/per-element kind. Returns n keys."""
    if key.ndim == 1:
        return tuple(jax.random.split(key, n))
    s = jax.vmap(lambda k: jax.random.split(k, n))(key)  # (B, n, 2)
    return tuple(s[:, i] for i in range(n))


def normal(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """jax.random.normal over a (B, ...) shape; per-element streams when
    key is (B, 2)."""
    if key.ndim == 1:
        return jax.random.normal(key, shape, dtype)
    assert key.shape[0] == shape[0], (key.shape, shape)
    return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(key)


def uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """jax.random.uniform over a (B, ...) shape; per-element streams when
    key is (B, 2)."""
    if key.ndim == 1:
        return jax.random.uniform(key, shape, dtype)
    assert key.shape[0] == shape[0], (key.shape, shape)
    return jax.vmap(lambda k: jax.random.uniform(k, shape[1:], dtype))(key)
