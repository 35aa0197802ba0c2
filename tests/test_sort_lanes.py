"""Lane-shuffle payload permutation (ops/sort_lanes.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from animnerf_tpu.ops.sort_lanes import _permute_lanes_pallas, permute_lanes


def _mk(B=2, C=5, R=19, seed=0):
    rng = np.random.default_rng(seed)
    pay = jnp.asarray(rng.normal(size=(B, C, R, 128)).astype(np.float32))
    order = jnp.asarray(
        np.stack([np.stack([rng.permutation(128) for _ in range(R)])
                  for _ in range(B)]).astype(np.int32))
    inv = jnp.argsort(order, axis=-1).astype(jnp.int32)
    return pay, order, inv


def test_kernel_matches_take_along_axis():
    pay, order, inv = _mk()
    out = _permute_lanes_pallas(pay, order, interpret=True)
    ref = jnp.take_along_axis(pay, order[:, None], axis=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_vjp_is_inverse_shuffle():
    pay, order, inv = _mk(seed=3)
    tgt = jnp.asarray(np.random.default_rng(1).normal(
        size=pay.shape).astype(np.float32))

    import animnerf_tpu.ops.sort_lanes as SL
    orig = SL._permute_impl
    SL._permute_impl = lambda p, o, interpret=False: \
        SL._permute_lanes_pallas(p, o, interpret=True)
    try:
        g1 = jax.grad(lambda p: jnp.sum(
            (permute_lanes(p, order, inv) - tgt) ** 2))(pay)
    finally:
        SL._permute_impl = orig
    g2 = jax.grad(lambda p: jnp.sum(
        (jnp.take_along_axis(p, order[:, None], axis=3) - tgt) ** 2))(pay)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
