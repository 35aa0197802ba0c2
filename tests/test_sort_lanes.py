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


def test_gather_lanes_matches_take_along_axis():
    """gather_lanes: general (non-permutation, short-index) lane gather —
    kernel (interpret) vs the CPU take_along_axis fallback, with L < 128
    payload lanes and J < 128 duplicate-laden indices (the sample_fine CDF
    bound lookup shape)."""
    import animnerf_tpu.ops.sort_lanes as SL

    rng = np.random.default_rng(7)
    B, C, R, L, J = 2, 2, 13, 63, 32
    pay = jnp.asarray(rng.normal(size=(B, C, R, L)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, size=(B, R, J)).astype(np.int32))

    ref = jnp.take_along_axis(pay, idx[:, None], axis=3)

    orig = SL._on_tpu
    SL._on_tpu = lambda: True
    orig_pallas = SL._permute_lanes_pallas
    SL._permute_lanes_pallas = lambda p, o, r_tile=8: \
        orig_pallas(p, o, interpret=True)
    try:
        out = SL.gather_lanes(pay, idx)
    finally:
        SL._on_tpu = orig
        SL._permute_lanes_pallas = orig_pallas
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
