"""Fused encode+MLP Pallas kernel (ops/fused_mlp.py) vs the flax NeRFMLP.

Forward and VJP parity in interpret mode, bf16 and f32 compute, including
the transposed-weight packing round trip (autodiff through pack_params must
map the kernel's packed cotangents back onto the flax pytree) and the
in-kernel positional-encoding chain rule (d_xyz)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from animnerf_tpu.models.nerf import NeRFMLP
from animnerf_tpu.ops.fused_mlp import fused_nerf, pack_params


def _setup(dtype):
    mod = NeRFMLP(freqs_xyz=10, freqs_dir=0, use_view=False,
                  compute_dtype=dtype)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(scale=0.5, size=(700, 3)).astype(np.float32))
    return mod, params, xyz


def _flax_out(mod, params, xyz):
    rgb, sigma = mod.apply(params, xyz)
    return rgb.astype(jnp.float32), sigma.astype(jnp.float32)


def _interpret_fused():
    """Context wrapper: route the kernels through interpret mode on CPU."""
    import animnerf_tpu.ops.fused_mlp as FM

    class _Ctx:
        def __enter__(self):
            self.fwd, self.bwd = FM.fused_nerf_fwd, FM.fused_nerf_bwd
            FM.fused_nerf_fwd = lambda *a, **k: self.fwd(
                *a, **{**k, "interpret": True})
            FM.fused_nerf_bwd = lambda *a, **k: self.bwd(
                *a, **{**k, "interpret": True})

        def __exit__(self, *exc):
            FM.fused_nerf_fwd, FM.fused_nerf_bwd = self.fwd, self.bwd

    return _Ctx()


def test_fused_forward_f32_matches_flax():
    mod, params, xyz = _setup(jnp.float32)
    ws, bs = pack_params(params, 10, dtype=jnp.float32)
    with _interpret_fused(), jax.disable_jit():
        rgb_k, sigma_k = fused_nerf(xyz, ws, bs, n_freqs=10, tile=256,
                                    dtype_name="float32")
    rgb_f, sigma_f = _flax_out(mod, params, xyz)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_k), np.asarray(sigma_f),
                               atol=1e-4)


def test_fused_forward_bf16_close_to_flax_bf16():
    mod, params, xyz = _setup(jnp.bfloat16)
    ws, bs = pack_params(params, 10, dtype=jnp.bfloat16)
    with _interpret_fused(), jax.disable_jit():
        rgb_k, sigma_k = fused_nerf(xyz, ws, bs, n_freqs=10, tile=256,
                                    dtype_name="bfloat16")
    rgb_f, sigma_f = _flax_out(mod, params, xyz)
    # both paths are bf16 with f32 accumulation; rounding points differ
    # slightly (bias-add order), so compare at bf16 resolution
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_f),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(sigma_k), np.asarray(sigma_f),
                               atol=3e-2, rtol=2e-2)


def test_fused_vjp_matches_flax_f32():
    """Gradients wrt xyz (through the in-kernel encoding chain rule — the
    body-param path) AND the flax params, with pack_params inside the
    differentiated function."""
    mod, params, xyz = _setup(jnp.float32)

    rng = np.random.default_rng(1)
    ct_rgb = jnp.asarray(rng.normal(size=(700, 3)).astype(np.float32))
    ct_sigma = jnp.asarray(rng.normal(size=(700, 1)).astype(np.float32))

    def loss_flax(p, x):
        rgb, sigma = mod.apply(p, x)
        return (jnp.sum(rgb * ct_rgb) + jnp.sum(sigma * ct_sigma))

    def loss_fused(p, x):
        ws, bs = pack_params(p, 10, dtype=jnp.float32)
        rgb, sigma = fused_nerf(x, ws, bs, n_freqs=10, tile=256,
                                dtype_name="float32")
        return (jnp.sum(rgb * ct_rgb) + jnp.sum(sigma * ct_sigma))

    with _interpret_fused(), jax.disable_jit():
        l_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, xyz)

    l_r, g_r = jax.value_and_grad(loss_flax, argnums=(0, 1))(params, xyz)
    assert abs(float(l_f) - float(l_r)) < 1e-2 * max(1.0, abs(float(l_r)))

    flat_f = jax.tree_util.tree_leaves_with_path(g_f[0])
    flat_r = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(g_r[0]))
    assert len(flat_f) == len(flat_r)
    for kp, a in flat_f:
        b = flat_r[jax.tree_util.keystr(kp)]
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num = np.linalg.norm((a - b).ravel())
        den = np.linalg.norm(b.ravel()) + 1e-12
        assert num / den < 1e-4, f"{jax.tree_util.keystr(kp)}: {num / den:.2e}"
    # d_xyz through the in-kernel encoding chain rule
    a, b = np.asarray(g_f[1], np.float64), np.asarray(g_r[1], np.float64)
    num = np.linalg.norm((a - b).ravel())
    den = np.linalg.norm(b.ravel()) + 1e-12
    assert num / den < 1e-4, f"d_xyz rel err {num / den:.2e}"
