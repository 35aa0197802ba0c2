"""Two-stage cluster-pruned kNN (ops/knn_cluster.py) — exactness of the
cluster-bound pruning argument, interpret-mode on CPU.

Contract (same as knn_pallas far_skip): exact top-k for points within
`thr` of a vertex; a conservative >thr bound + index 0 beyond.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animnerf_tpu.ops.knn import knn_bruteforce
from animnerf_tpu.ops.knn_cluster import kd_cluster, knn_two_stage


def _cloud(B=2, V=900, seed=0):
    rng = np.random.default_rng(seed)
    return rng, jnp.asarray(rng.normal(scale=0.3, size=(B, V, 3))
                            .astype(np.float32))


def test_kd_cluster_partitions_and_covers():
    rng, verts = _cloud()
    B, V = verts.shape[:2]
    perm, verts_s, cent, radii = kd_cluster(verts)
    C = cent.shape[1]
    L = perm.shape[1] // C
    # permutation of the padded index range
    for b in range(B):
        assert (np.sort(np.asarray(perm[b])) == np.arange(perm.shape[1])).all()
    # every real vertex within its cluster's radius
    vs = np.asarray(verts_s).reshape(B, C, L, 3)
    real = np.asarray(perm).reshape(B, C, L) < V
    d = np.linalg.norm(vs - np.asarray(cent)[:, :, None], axis=-1)
    r = np.asarray(radii)[:, :, None]
    assert (d[real] <= np.broadcast_to(r, d.shape)[real] + 1e-5).all()


def test_two_stage_matches_bruteforce_near_and_far_semantics():
    rng, verts = _cloud()
    B, V = verts.shape[:2]
    near = verts[:, :400] + 0.05 * jnp.asarray(
        rng.normal(size=(B, 400, 3)).astype(np.float32))
    far = jnp.asarray(rng.normal(scale=3.0, size=(B, 300, 3))
                      .astype(np.float32)) + 5.0
    pts = jnp.concatenate([near, far], axis=1)

    thr = 0.2
    d2s, i2s = knn_two_stage(pts, verts, k=4, thr=thr, tile_n=128,
                             interpret=True)
    d_bf, i_bf = knn_bruteforce(pts, verts, k=4)
    d2s, i2s, d_bf, i_bf = map(np.asarray, (d2s, i2s, d_bf, i_bf))

    near_m = d_bf[..., 0] < thr
    assert near_m.mean() > 0.4
    np.testing.assert_allclose(d2s[near_m], d_bf[near_m], atol=1e-5)
    assert (i2s[near_m] == i_bf[near_m]).mean() > 0.999  # ties only
    far_m = ~near_m
    assert (d2s[far_m] > thr).all()
    # the downstream validity mask is identical
    assert ((d2s[..., 0] < thr) == (d_bf[..., 0] < thr)).all()
