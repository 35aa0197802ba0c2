"""Backend probe shared by the kernel dispatchers.

Every Pallas TPU kernel (kNN, blend, warp-blend, fused MLP, lane sort)
dispatches on this: Mosaic lowering exists only for real TPUs and the
axon relay backend. Honors ANIMNERF_PLATFORM because the CLIs apply that
override before first device use (utils/compile_cache.py).
"""

from __future__ import annotations


def on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover — uninitialised/odd backends
        return False
