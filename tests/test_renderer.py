"""Tests for sampling and compositing (render/volume_renderer.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animnerf_tpu.render.volume_renderer import (
    RendererConfig,
    composite,
    render_rays,
    sample_coarse,
    sample_fine,
)


def _rays(B=1, R=8, near=1.0, far=3.0):
    rays = np.zeros((B, R, 8), dtype=np.float32)
    rays[..., 5] = -1.0  # dir -z
    rays[..., 2] = 4.0   # origin z=4
    rays[..., 6] = near
    rays[..., 7] = far
    return jnp.asarray(rays)


def test_sample_coarse_deterministic_grid():
    cfg = RendererConfig(n_coarse=8)
    z = np.asarray(sample_coarse(cfg, _rays(), perturb=0.0, key=None))
    # linspace(0, 1-1/K) in depth: first sample at near, last at
    # near + (far-near)*(1-1/K)
    np.testing.assert_allclose(z[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(z[..., -1], 1.0 + 2.0 * (1 - 1 / 8), atol=1e-5)
    assert (np.diff(z, axis=-1) > 0).all()


def test_sample_coarse_perturbed_within_bins():
    cfg = RendererConfig(n_coarse=16)
    base = np.asarray(sample_coarse(cfg, _rays(), perturb=0.0, key=None))
    z = np.asarray(sample_coarse(cfg, _rays(), perturb=1.0,
                                 key=jax.random.PRNGKey(0)))
    mids = 0.5 * (base[..., 1:] + base[..., :-1])
    lower = np.concatenate([base[..., :1], mids], -1)
    upper = np.concatenate([mids, base[..., -1:]], -1)
    assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()


def test_sample_fine_concentrates_on_heavy_bins():
    cfg = RendererConfig(n_coarse=10, n_fine=64)
    B, R = 1, 4
    bins = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 9), (B, R, 9))
    w = np.full((B, R, 8), 1e-6, np.float32)
    w[..., 3] = 1.0  # all mass in bin 3 -> z in [bins[3], bins[4]]
    z = np.asarray(sample_fine(cfg, bins, jnp.asarray(w), det=True, key=None))
    lo, hi = 1.0 + 3 / 8, 1.0 + 4 / 8
    frac_inside = ((z >= lo - 1e-3) & (z <= hi + 1e-3)).mean()
    assert frac_inside > 0.95


def test_composite_empty_space_white_background():
    cfg = RendererConfig(white_bkgd=True)
    rays = _rays()
    z = sample_coarse(cfg, rays, 0.0, None)
    B, R, K = z.shape
    rgbs = jnp.zeros((B, R, K, 3)) + 0.5
    sigmas = jnp.full((B, R, K), -100.0)  # empty space (relu -> 0)
    w, rgb, depth, alpha = composite(cfg, rgbs, sigmas, rays, z, 0.0, None)
    np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-5)   # white
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth)[..., 0], 3.0, atol=1e-4)  # far


def test_composite_opaque_wall():
    cfg = RendererConfig(white_bkgd=True)
    rays = _rays()
    z = sample_coarse(cfg, rays, 0.0, None)
    B, R, K = z.shape
    rgbs = jnp.zeros((B, R, K, 3)).at[..., 0].set(0.8)
    sigmas = jnp.full((B, R, K), 1e4)  # instantly opaque
    w, rgb, depth, alpha = composite(cfg, rgbs, sigmas, rays, z, 0.0, None)
    np.testing.assert_allclose(np.asarray(alpha), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rgb)[..., 0], 0.8, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth)[..., 0],
                               np.asarray(z)[..., 0], atol=1e-3)


def test_composite_weights_sum_le_one():
    cfg = RendererConfig()
    rays = _rays(R=16)
    z = sample_coarse(cfg, rays, 0.0, None)
    rng = np.random.default_rng(0)
    B, R, K = z.shape
    sigmas = jnp.asarray(rng.normal(size=(B, R, K)).astype(np.float32) * 5)
    rgbs = jnp.zeros((B, R, K, 3)) + 0.5
    w, _, _, alpha = composite(cfg, rgbs, sigmas, rays, z, 0.0, None)
    assert (np.asarray(w) >= 0).all()
    assert (np.asarray(alpha) <= 1.0 + 1e-5).all()


def _toy_point_fn(center=np.array([0, 0, 2.0], np.float32), radius=0.5):
    """A solid sphere of density at `center` with red color."""

    def point_fn(xyz, viewdir, use_fine):
        d = jnp.linalg.norm(xyz - center, axis=-1, keepdims=True)
        sigma = jnp.where(d < radius, 100.0, -100.0)
        rgb = jnp.zeros_like(xyz).at[..., 0].set(1.0)
        return rgb, sigma

    return point_fn


def test_render_rays_end_to_end_coarse_fine():
    cfg = RendererConfig(n_coarse=32, n_fine=16, white_bkgd=True)
    rays = _rays(R=4, near=0.5, far=4.0)
    out = render_rays(cfg, _toy_point_fn(), rays, perturb=0.0)
    assert set(out) == {"rgbs", "alphas", "depths",
                        "rgbs_fine", "alphas_fine", "depths_fine"}
    # ray from z=4 toward -z hits the sphere shell at z=2.5 -> depth 1.5
    np.testing.assert_allclose(np.asarray(out["depths_fine"])[..., 0], 1.5,
                               atol=0.1)
    np.testing.assert_allclose(np.asarray(out["rgbs_fine"])[..., 0], 1.0,
                               atol=1e-2)  # red
    np.testing.assert_allclose(np.asarray(out["alphas_fine"]), 1.0, atol=1e-2)


def test_render_rays_share_fine_single_output():
    cfg = RendererConfig(n_coarse=16, n_fine=8, share_fine=True)
    out = render_rays(cfg, _toy_point_fn(), _rays(R=2), perturb=0.0)
    assert set(out) == {"rgbs", "alphas", "depths"}


def test_render_rays_perturb_reproducible():
    cfg = RendererConfig(n_coarse=16, n_fine=8)
    rays = _rays(R=2)
    k = jax.random.PRNGKey(7)
    o1 = render_rays(cfg, _toy_point_fn(), rays, perturb=1.0, key=k)
    o2 = render_rays(cfg, _toy_point_fn(), rays, perturb=1.0, key=k)
    np.testing.assert_array_equal(np.asarray(o1["rgbs_fine"]),
                                  np.asarray(o2["rgbs_fine"]))
