"""Persistent XLA compilation cache.

The compacted render/train pipelines compile one program per capacity rung
(render/compact.py); first-ever compiles on a TPU backend run 20-40 s each.
JAX's client-side compilation cache keys on the HLO, so enabling it makes
every later process start warm. The reference has no equivalent concern
(eager torch), so this is infrastructure the TPU design owes the user.

Called by the CLIs, bench scripts and the training loop; a no-op if the
cache is already configured or the backend rejects it.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/animnerf_tpu/xla")


def enable_compile_cache(cache_dir: "str | None" = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache; returns the
    directory used (None if disabled via ANIMNERF_NO_COMPILE_CACHE=1)."""
    if os.environ.get("ANIMNERF_NO_COMPILE_CACHE", "0") == "1":
        return None
    import jax

    d = cache_dir or os.environ.get("ANIMNERF_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every program that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unsupported backend/config — run without the cache
        return None
    return d
