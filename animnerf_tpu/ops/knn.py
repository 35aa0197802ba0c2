"""k-nearest-neighbour queries against the SMPL vertex cloud.

Replaces the reference's external KNN_CUDA extension
(/root/reference/models/anim_nerf.py:81-84,157-163; README.md:21) with a
TPU-native design:

  * the (points x verts) squared-distance matrix is expressed through a
    single (N,3)@(3,V) matmul — `|p-v|^2 = |p|^2 - 2 p.v + |v|^2` — so the
    heavy term rides the MXU;
  * `jax.lax.top_k` extracts the k smallest distances;
  * memory is bounded by tiling the point axis with `lax.map`, never
    materialising more than (tile x V) distances (the reference bounds the
    same blow-up with its 2048-ray chunk loop);
  * a fused Pallas kernel (ops/knn_pallas.py) implements the same
    contract without materialising the distance matrix at all.

The kNN itself is non-differentiable (indices); distances are recomputed
differentiably downstream where gradients are needed — mirroring the
reference's no_grad kNN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pad_to_multiple(x: jax.Array, multiple: int, axis: int, fill=0.0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill), n


@partial(jax.jit, static_argnames=("k", "tile"))
def knn(points: jax.Array, verts: jax.Array, k: int = 4,
        tile: int = 8192) -> tuple[jax.Array, jax.Array]:
    """Exact k nearest vertices for each query point.

    Args:
      points: (..., N, 3) query points.
      verts: (..., V, 3) reference cloud (V small, e.g. 6890 — replicated).
      k: neighbours to return.
      tile: point-axis tile bounding the transient distance matrix.
    Returns:
      (dists, idx): (..., N, k) euclidean distances (ascending) and vertex
      indices, matching the brute-force torch fallback semantics
      (reference anim_nerf.py:161-163).
    """
    batch_shape = points.shape[:-2]
    N, V = points.shape[-2], verts.shape[-2]
    p = points.reshape((-1, N, 3))
    v = verts.reshape((-1, V, 3))

    def one_batch(args):
        p_b, v_b = args
        v_sq = jnp.sum(v_b * v_b, axis=-1)  # (V,)

        def one_tile(p_tile):  # (T, 3)
            p_sq = jnp.sum(p_tile * p_tile, axis=-1, keepdims=True)  # (T,1)
            # MXU: (T,3)@(3,V)
            cross = jnp.matmul(p_tile, v_b.T, precision=jax.lax.Precision.HIGHEST)
            d2 = p_sq - 2.0 * cross + v_sq[None, :]
            neg_d2, idx = jax.lax.top_k(-d2, k)
            d2k = jnp.maximum(-neg_d2, 0.0)
            return jnp.sqrt(d2k), idx

        if N <= tile:
            return one_tile(p_b)
        p_pad, n_orig = _pad_to_multiple(p_b, tile, axis=0)
        tiles = p_pad.reshape(-1, tile, 3)
        d, i = jax.lax.map(one_tile, tiles)
        return (d.reshape(-1, k)[:n_orig], i.reshape(-1, k)[:n_orig])

    d, i = jax.lax.map(one_batch, (p, v))
    return (d.reshape(*batch_shape, N, k), i.reshape(*batch_shape, N, k))
