"""Isolate the NeRF MLP cost: XLA Dense-chain vs shapes/dtype variants.

Times fwd+bwd (grad wrt params and input) of the 8x256 trunk + heads on the
flagship per-step point counts (coarse 1.05M + fine 1.57M points), to bound
what a fused Pallas MLP kernel could save.

Usage: python tools/bench_mlp.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench(fn, inputs, n=6):
    force = lambda o: jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
    for x in inputs[:2]:
        force(fn(x))
    t0 = time.perf_counter()
    for s in range(n):
        force(fn(inputs[2 + s]))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from animnerf_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from animnerf_tpu.models.nerf import NeRFMLP

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    for shape_name, shape in (("3d (16,163840,3)", (16, 163840, 3)),
                              ("2d (2621440,3)", (2621440, 3))):
        mod = NeRFMLP(freqs_xyz=10, freqs_dir=0, use_view=False,
                      compute_dtype=jnp.bfloat16)
        params = mod.init(key, jnp.zeros((2, 3), np.float32))

        @jax.jit
        def fwd(x, params=params, mod=mod):
            rgb, sigma = mod.apply(params, x)
            return jnp.sum(rgb.astype(jnp.float32)) + jnp.sum(sigma)

        @jax.jit
        def fwdbwd2(x, params=params, mod=mod):
            def loss(p, xx):
                rgb, sigma = mod.apply(p, xx)
                return jnp.sum(rgb.astype(jnp.float32)) + jnp.sum(sigma)

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return g

        xs = [jnp.asarray(rng.normal(size=shape).astype(np.float32))
              for _ in range(8)]
        t_f = bench(fwd, xs)
        t_fb = bench(fwdbwd2, xs)
        n_pts = int(np.prod(shape[:-1]))
        # trunk+heads flops/pt: 8 dense (63/319->256) + sigma + xyz_final
        # + dir half-width + rgb
        flops_pt = 2 * (63 * 256 + 319 * 256 + 6 * 256 * 256 + 256
                        + 256 * 256 + 256 * 128 + 128 * 3)
        fl = n_pts * flops_pt
        print(f"{shape_name:20s} fwd {t_f:7.1f} ms ({fl / t_f / 1e9:6.1f} TF/s)  "
              f"fwd+bwd {t_fb:7.1f} ms ({3 * fl / t_fb / 1e9:6.1f} TF/s)")


if __name__ == "__main__" and not os.environ.get("BENCH_FUSED"):
    main()


def bench_fused():
    from animnerf_tpu.models.embedding import positional_encoding
    from animnerf_tpu.models.nerf import NeRFMLP
    from animnerf_tpu.ops.fused_mlp import fused_nerf, pack_params

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    mod = NeRFMLP(freqs_xyz=10, freqs_dir=0, use_view=False,
                  compute_dtype=jnp.bfloat16)
    params = mod.init(key, jnp.zeros((2, 3), np.float32))
    M = 2621440

    for tile in (512, 1024):
        @jax.jit
        def fwd(x, params=params, tile=tile):
            ws, bs = pack_params(params, 10)
            rgb, sigma = fused_nerf(x, ws, bs, n_freqs=10, tile=tile)
            return jnp.sum(rgb) + jnp.sum(sigma)

        @jax.jit
        def fwdbwd(x, params=params, tile=tile):
            def loss(p, xx):
                ws, bs = pack_params(p, 10)
                rgb, sigma = fused_nerf(xx, ws, bs, n_freqs=10, tile=tile)
                return jnp.sum(rgb) + jnp.sum(sigma)

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return g

        xs = [jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
              for _ in range(8)]
        t_f = bench(fwd, xs)
        t_fb = bench(fwdbwd, xs)
        flops_pt = 2 * (63 * 256 + 319 * 256 + 6 * 256 * 256 + 256
                        + 256 * 256 + 256 * 128 + 128 * 3)
        fl = M * flops_pt
        print(f"fused tile={tile:5d}  fwd {t_f:7.1f} ms ({fl / t_f / 1e9:6.1f}"
              f" TF/s)  fwd+bwd {t_fb:7.1f} ms ({3 * fl / t_fb / 1e9:6.1f} TF/s)")


if __name__ == "__main__" and os.environ.get("BENCH_FUSED"):
    bench_fused()
