"""Tests for positional encoding and the NeRF/DeRF MLPs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animnerf_tpu.models.embedding import embedding_dim, positional_encoding
from animnerf_tpu.models.nerf import DeRFMLP, NeRFMLP, rotation_from_ortho6d


def test_encoding_layout_matches_reference():
    """Reference layout: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]
    (models/embedding.py:22-38) — identity first, per-freq sin/cos blocks."""
    x = np.array([[0.3, -1.2, 2.0]], dtype=np.float32)
    n_freqs = 4
    out = np.asarray(positional_encoding(jnp.asarray(x), n_freqs))
    expected = [x]
    for k in range(n_freqs):
        f = 2.0**k
        expected.append(np.sin(f * x))
        expected.append(np.cos(f * x))
    expected = np.concatenate(expected, axis=-1)
    assert out.shape[-1] == embedding_dim(3, n_freqs) == 27
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_encoding_zero_freqs_is_identity():
    x = jnp.ones((2, 3))
    np.testing.assert_array_equal(np.asarray(positional_encoding(x, 0)),
                                  np.asarray(x))


def test_nerf_shapes_and_param_structure():
    m = NeRFMLP(use_view=False, apperance_dim=0)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    rgb, sigma = m.apply(params, jnp.zeros((4, 7, 3)))
    assert rgb.shape == (4, 7, 3) and sigma.shape == (4, 7, 1)
    assert (rgb >= 0).all() and (rgb <= 1).all()  # sigmoid head

    p = params["params"]
    # reference architecture: 63 -> 256, skip concat at layer 4 (319 -> 256)
    assert p["xyz_0"]["kernel"].shape == (63, 256)
    assert p["xyz_4"]["kernel"].shape == (63 + 256, 256)
    assert p["sigma"]["kernel"].shape == (256, 1)
    assert p["xyz_final"]["kernel"].shape == (256, 256)
    assert p["dir_0"]["kernel"].shape == (256, 128)
    assert p["rgb"]["kernel"].shape == (128, 3)


def test_nerf_view_branch_dims():
    m = NeRFMLP(use_view=True, freqs_dir=4, apperance_dim=8)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                    None, jnp.zeros((1, 8)))
    # dir input: 256 + (3 + 3*4*2 = 27) + 8
    assert params["params"]["dir_0"]["kernel"].shape == (256 + 27 + 8, 128)


def test_nerf_sigma_path_consistent():
    m = NeRFMLP()
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32))
    _, sigma_full = m.apply(params, x)
    sigma_only = m.apply(params, x, method=NeRFMLP.get_sigma)
    np.testing.assert_allclose(np.asarray(sigma_full), np.asarray(sigma_only),
                               atol=1e-6)


def test_nerf_bf16_compute_close_to_f32():
    m32 = NeRFMLP(compute_dtype=jnp.float32)
    m16 = NeRFMLP(compute_dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(2), jnp.zeros((1, 3)))
    x = jnp.asarray(np.random.default_rng(1).normal(scale=0.5, size=(16, 3))
                    .astype(np.float32))
    rgb32, s32 = m32.apply(params, x)
    rgb16, s16 = m16.apply(params, x)
    assert rgb16.dtype == jnp.float32  # heads stay f32
    np.testing.assert_allclose(np.asarray(rgb16), np.asarray(rgb32), atol=0.1)


def test_derf_and_ortho6d():
    m = DeRFMLP(out_channels=9)
    params = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 3)))
    out = m.apply(params, jnp.zeros((2, 5, 3)))
    assert out.shape == (2, 5, 9)
    R = rotation_from_ortho6d(out[..., :6])
    RtR = np.einsum("...ij,...ik->...jk", np.asarray(R, np.float64),
                    np.asarray(R, np.float64))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-4)
