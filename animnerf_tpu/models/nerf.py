"""Canonical-space NeRF and deformation (DeRF) MLPs.

Parity targets: reference models/nerf.py:60-190 (NeRF: D=8, W=256, skip at
layer 4, sigma head + view/appearance branch at W/2) and models/nerf.py:7-58
(DeRF: D=6, W=128 -> 9-dof ortho-6d rotation + translation).

TPU notes: the MLP is the FLOP hot spot (~1 MFLOP/point); all layers are
plain Dense so XLA tiles them straight onto the MXU. A ``compute_dtype`` of
bfloat16 with float32 params gives MXU-native throughput; heads accumulate
in float32.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from animnerf_tpu.models.embedding import positional_encoding


class NeRFMLP(nn.Module):
    """Canonical radiance field.

    __call__(xyz, viewdir=None, deformation_code=None, apperance_code=None)
      -> (rgb (..., 3), sigma (..., 1))
    """

    depth: int = 8
    width: int = 256
    freqs_xyz: int = 10
    freqs_dir: int = 4
    use_view: bool = False
    deformation_dim: int = 0
    apperance_dim: int = 0
    skips: Sequence[int] = (4,)
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        # layers live in setup() so that get_sigma can be invoked standalone
        # via apply(..., method=NeRFMLP.get_sigma)
        for i in range(self.depth):
            setattr(self, f"xyz_{i}",
                    nn.Dense(self.width, dtype=self.compute_dtype))
        self.sigma = nn.Dense(1, dtype=jnp.float32)
        self.xyz_final = nn.Dense(self.width, dtype=self.compute_dtype)
        self.dir_0 = nn.Dense(self.width // 2, dtype=self.compute_dtype)
        self.rgb = nn.Dense(3, dtype=jnp.float32)

    def _trunk(self, xyz, deformation_code):
        """Shared xyz encoder; returns (sigma, trunk_features)."""
        h = positional_encoding(xyz, self.freqs_xyz)
        if self.deformation_dim > 0:
            h = jnp.concatenate([h, deformation_code], axis=-1)
        encoded = h.astype(self.compute_dtype)

        h = encoded
        for i in range(self.depth):
            if i in self.skips:
                h = jnp.concatenate([encoded, h], axis=-1)
            h = nn.relu(getattr(self, f"xyz_{i}")(h))

        return self.sigma(h), h

    def __call__(self, xyz, viewdir=None, deformation_code=None,
                 apperance_code=None):
        sigma, h = self._trunk(xyz, deformation_code)

        dir_in = self.xyz_final(h)
        if self.use_view:
            dir_emb = positional_encoding(viewdir, self.freqs_dir)
            dir_in = jnp.concatenate(
                [dir_in, dir_emb.astype(self.compute_dtype)], axis=-1)
        if self.apperance_dim > 0:
            dir_in = jnp.concatenate(
                [dir_in, apperance_code.astype(self.compute_dtype)], axis=-1)

        d = nn.relu(self.dir_0(dir_in))
        rgb = nn.sigmoid(self.rgb(d))
        return rgb, sigma

    def get_sigma(self, xyz, deformation_code=None):
        """Density only — used by the fg/bg regularizers and mesh extraction."""
        sigma, _ = self._trunk(xyz, deformation_code)
        return sigma


def nerf_sigma(module: NeRFMLP, params, xyz, deformation_code=None):
    return module.apply(params, xyz, deformation_code=deformation_code,
                        method=NeRFMLP.get_sigma)


def nerf_normal(module: NeRFMLP, params, xyz, deformation_code=None,
                delta: float = 0.02):
    """d alpha / d xyz where alpha = 1 - exp(-delta * relu(sigma)).

    Differentiable itself (grad-of-grad), mirroring the reference's
    create_graph=True autograd normal (models/nerf.py:177-190).
    """

    def alpha_sum(pts):
        sigma = nerf_sigma(module, params, pts, deformation_code)
        alpha = 1.0 - jnp.exp(-delta * jax.nn.relu(sigma))
        return jnp.sum(alpha)

    return jax.grad(alpha_sum)(xyz)


class DeRFMLP(nn.Module):
    """Deformation field: xyz (+code) -> ortho-6d rotation + translation."""

    depth: int = 6
    width: int = 128
    freqs_xyz: int = 10
    deformation_dim: int = 0
    out_channels: int = 9
    skips: Sequence[int] = (4,)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, deformation_code=None):
        h = positional_encoding(xyz, self.freqs_xyz)
        if self.deformation_dim > 0:
            h = jnp.concatenate([h, deformation_code], axis=-1)
        encoded = h.astype(self.compute_dtype)
        h = encoded
        for i in range(self.depth):
            if i in self.skips:
                h = jnp.concatenate([encoded, h], axis=-1)
            h = nn.Dense(self.width, dtype=self.compute_dtype,
                         name=f"xyz_{i}")(h)
            h = nn.relu(h)
        return nn.Dense(self.out_channels, dtype=jnp.float32, name="out")(h)


def rotation_from_ortho6d(ortho6d: jax.Array) -> jax.Array:
    """Gram-Schmidt two-vector rotation parameterization (Zhou et al. 2019;
    reference models/anim_nerf.py:9-22)."""
    x_raw = ortho6d[..., 0:3]
    y_raw = ortho6d[..., 3:6]
    x = x_raw / (jnp.linalg.norm(x_raw, axis=-1, keepdims=True) + 1e-8)
    z = jnp.cross(x, y_raw)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)
