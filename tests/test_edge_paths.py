"""Edge-config coverage: query_inside, n_fine_depth, iper YAML, lindisp."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from animnerf_tpu.models.anim_nerf import AnimNeRFConfig, AnimNeRFModel
from animnerf_tpu.render.volume_renderer import (
    RendererConfig,
    render_rays,
    sample_coarse,
)


def test_query_inside_masks_rgb():
    cfg = AnimNeRFConfig(use_unpose=False, use_fine=False, query_inside=True,
                         remat=False)
    scene = AnimNeRFModel(cfg)
    params = {"nerf": scene.nerf.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))}
    xyz = jnp.zeros((1, 6, 3))
    valid = jnp.asarray([[1.0, 0.0, 1.0, 0.0, 1.0, 1.0]])[..., None]
    rgb, sigma = scene.field_points(params, xyz, valid=valid)
    rgb = np.asarray(rgb)
    sigma = np.asarray(sigma)
    assert (rgb[0, [1, 3]] == 0).all()      # outside: rgb zeroed
    assert (sigma[0, [1, 3]] == -1e5).all()  # outside: sigma filled
    assert (rgb[0, [0, 2, 4, 5]] != 0).any()


@pytest.mark.slow
def test_n_fine_depth_sampling():
    """depth-guided fine samples (reference volume_rendering.py:99-111)."""
    cfg = RendererConfig(n_coarse=16, n_fine=0, n_fine_depth=8,
                         white_bkgd=True)
    rays = np.zeros((1, 4, 8), np.float32)
    rays[..., 2] = 4.0
    rays[..., 5] = -1.0
    rays[..., 6] = 0.5
    rays[..., 7] = 4.0

    def point_fn(xyz, viewdir, use_fine):
        d = jnp.linalg.norm(xyz - jnp.array([0, 0, 2.0]), axis=-1,
                            keepdims=True)
        sigma = jnp.where(d < 0.5, 100.0, -100.0)
        return jnp.ones_like(xyz) * 0.5, sigma

    out = render_rays(cfg, point_fn, jnp.asarray(rays), perturb=1.0,
                      key=jax.random.PRNGKey(0))
    assert "rgbs_fine" in out
    assert np.isfinite(np.asarray(out["rgbs_fine"])).all()


def test_lindisp_false_disparity_sampling():
    cfg = RendererConfig(n_coarse=8, lindisp=False)
    rays = np.zeros((1, 1, 8), np.float32)
    rays[..., 6] = 1.0
    rays[..., 7] = 8.0
    z = np.asarray(sample_coarse(cfg, jnp.asarray(rays), 0.0, None))[0, 0]
    # linear in disparity: 1/z linearly spaced between 1 and 1/8
    inv = 1.0 / z
    step = inv[0] - inv[1]
    np.testing.assert_allclose(np.diff(inv), -step, rtol=1e-4)


def test_iper_reference_yaml():
    path = "/root/reference/configs/iper/iper_023_1_1.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs unavailable")
    from animnerf_tpu.config import load_cfg_file

    cfg = load_cfg_file(path)
    assert cfg.model_type == "smpl"
    assert cfg.num_frames > 0


def test_refine_reference_yaml():
    path = "/root/reference/configs/people_snapshot/male-3-casual_refine.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs unavailable")
    from animnerf_tpu.config import load_cfg_file

    cfg = load_cfg_file(path)
    assert cfg.train.model_names_to_load == ["anim_nerf"]
    assert cfg.train.pretrained_model_requires_grad is False
