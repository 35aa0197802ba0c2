"""Sinusoidal positional encoding (parity: reference models/embedding.py:5-39).

Output layout must match the reference exactly for checkpoint parity:
[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] — i.e. the identity
first, then per-frequency sin/cos pairs, each applied to the full channel
block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def embedding_dim(in_channels: int, n_freqs: int) -> int:
    return in_channels * (2 * n_freqs + 1)


def positional_encoding(x: jax.Array, n_freqs: int, logscale: bool = True) -> jax.Array:
    """Embed x -> (x, sin(f_k x), cos(f_k x), ...).

    Args:
      x: (..., C)
      n_freqs: number of frequency bands. 0 -> identity.
    Returns:
      (..., C * (2*n_freqs + 1))
    """
    if n_freqs == 0:
        return x
    if logscale:
        freqs = 2.0 ** np.arange(n_freqs, dtype=np.float32)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs, dtype=np.float32)

    # (..., F, C): one fused sin and one fused cos over all bands (VPU-friendly,
    # single transcendental launch each), then interleave to the reference's
    # [sin_f0, cos_f0, sin_f1, cos_f1, ...] block order.
    xf = x[..., None, :] * jnp.asarray(freqs)[:, None]  # (..., F, C)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    sc = jnp.stack([sin, cos], axis=-2)  # (..., F, 2, C)
    sc = sc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)
