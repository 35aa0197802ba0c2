"""ops/perm_sort.py: permutation-via-sort compaction primitives.

Oracle: plain take_along_axis / scatter with the same rank tables. The
interesting part is the custom VJP (inverse permutation, also a sort) —
checked against jax's autodiff of the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np

from animnerf_tpu.ops.perm_sort import (
    compact_channels,
    compaction_ranks,
    expand_channels,
    sort_permute,
)

B, N, CAP = 3, 96, 40


def _rig(seed=0, frac=0.37):
    rng = np.random.default_rng(seed)
    keep = jnp.asarray(rng.uniform(size=(B, N)) < frac)
    vals = tuple(jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
                 for _ in range(3))
    return keep, vals


def test_ranks_are_inverse_permutations():
    keep, _ = _rig()
    o, inv, n = compaction_ranks(keep)
    o_np, inv_np = np.asarray(o), np.asarray(inv)
    for b in range(B):
        assert sorted(o_np[b]) == list(range(N))
        assert (o_np[b][inv_np[b]] == np.arange(N)).all()
        k = int(np.asarray(keep)[b].sum())
        # survivors first, each block in original (ascending) order
        assert (np.sort(o_np[b][:k]) == o_np[b][:k]).all()
        assert set(o_np[b][:k]) == set(np.nonzero(np.asarray(keep)[b])[0])
    assert int(n) == int(np.asarray(keep).sum(1).max())


def test_compact_expand_match_indexing_oracle():
    keep, vals = _rig()
    o, inv, n = compaction_ranks(keep)
    assert int(n) <= CAP
    comp = compact_channels(vals, o, inv, CAP)
    for c, v in zip(comp, vals):
        np.testing.assert_array_equal(
            np.asarray(c), np.take_along_axis(np.asarray(v),
                                              np.asarray(o)[:, :CAP], 1))
    fills = (0.0, -1e5, 2.5)
    dense = expand_channels(comp, fills, o, inv)
    for d, v, fill in zip(dense, vals, fills):
        ref = np.full((B, N), fill, np.float32)
        np.put_along_axis(ref, np.asarray(o)[:, :CAP],
                          np.take_along_axis(np.asarray(v),
                                             np.asarray(o)[:, :CAP], 1), 1)
        np.testing.assert_array_equal(np.asarray(d), ref)


def test_vjp_matches_indexing_autodiff():
    keep, vals = _rig(seed=1)
    o, inv, _ = compaction_ranks(keep)

    def via_sort(v0, v1):
        c = compact_channels((v0, v1), o, inv, CAP)
        d = expand_channels((c[0] * 2.0 + c[1], c[1]), (0.5, 0.0), o, inv)
        return jnp.sum(d[0] * jnp.cos(d[1])) + jnp.sum(c[0] ** 2)

    def via_index(v0, v1):
        sel = jnp.minimum(o[:, :CAP], N - 1)  # o[:, :CAP] < N always
        c = tuple(jnp.take_along_axis(v, sel, axis=1) for v in (v0, v1))
        outs = []
        for src, fill in (((c[0] * 2.0 + c[1]), 0.5), (c[1], 0.0)):
            base = jnp.full((B, N), fill, jnp.float32)
            outs.append(base.at[
                jnp.arange(B)[:, None], o[:, :CAP]].set(src))
        return (jnp.sum(outs[0] * jnp.cos(outs[1]))
                + jnp.sum(c[0] ** 2))

    v0, v1 = vals[0], vals[1]
    np.testing.assert_allclose(via_sort(v0, v1), via_index(v0, v1),
                               rtol=1e-6)
    g_s = jax.grad(via_sort, argnums=(0, 1))(v0, v1)
    g_i = jax.grad(via_index, argnums=(0, 1))(v0, v1)
    for a, b in zip(g_s, g_i):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sort_permute_roundtrip_and_mixed_dtypes():
    keep, vals = _rig(seed=2)
    o, inv, _ = compaction_ranks(keep)
    extra = (vals[0] > 0).astype(jnp.int32)
    perm = sort_permute((vals[0], extra), inv, o)
    back = sort_permute(perm, o, inv)
    np.testing.assert_array_equal(np.asarray(back[0]), np.asarray(vals[0]))
    np.testing.assert_array_equal(np.asarray(back[1]), np.asarray(extra))


def test_morton_ranks_are_spatial_permutations():
    """compaction_ranks with xyz_rows: still a full permutation with
    survivors first and dropped in original order — but survivors ordered
    by Morton code (spatially coherent lanes for the kNN tile skip).
    compact/expand must stay exact inverses under that order."""
    rng = np.random.default_rng(4)
    keep, vals = _rig(seed=4)
    xyz = tuple(jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
                for _ in range(3))
    o, inv, n = compaction_ranks(keep, xyz_rows=xyz)
    o_np, inv_np = np.asarray(o), np.asarray(inv)
    from animnerf_tpu.ops.perm_sort import _morton_rows

    m = np.asarray(_morton_rows(*xyz))
    for b in range(B):
        assert sorted(o_np[b]) == list(range(N))
        assert (o_np[b][inv_np[b]] == np.arange(N)).all()
        k = int(np.asarray(keep)[b].sum())
        assert set(o_np[b][:k]) == set(np.nonzero(np.asarray(keep)[b])[0])
        # survivors in ascending Morton order
        mk = m[b][o_np[b][:k]]
        assert (np.sort(mk) == mk).all()
        # dropped tail in original index order
        assert (np.sort(o_np[b][k:]) == o_np[b][k:]).all()
    assert int(n) == int(np.asarray(keep).sum(1).max())

    # roundtrip stays exact under the spatial permutation
    comp = compact_channels(vals, o, inv, CAP)
    dense = expand_channels(comp, (0.0, 0.0, 0.0), o, inv)
    for d, v in zip(dense, vals):
        kept = np.asarray(keep)
        np.testing.assert_array_equal(np.asarray(d)[kept],
                                      np.asarray(v)[kept])
