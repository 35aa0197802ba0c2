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


def apply_platform_override() -> str | None:
    """Honor ANIMNERF_PLATFORM=<cpu|tpu|...> as a hard jax platform pin.

    Some deployments inject a sitecustomize that force-sets
    jax_platforms after env vars are read, so JAX_PLATFORMS alone can't
    steer the CLIs off a dead accelerator tunnel. This re-asserts the
    requested platform via jax.config (must run before first device use).
    Returns the platform applied, or None when unset."""
    plat = os.environ.get("ANIMNERF_PLATFORM")
    if not plat:
        return None
    import jax

    jax.config.update("jax_platforms", plat)
    return plat


def enable_compile_cache(cache_dir: "str | None" = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache; returns the
    directory used (None if disabled via ANIMNERF_NO_COMPILE_CACHE=1).

    Also applies the ANIMNERF_PLATFORM override — this is the first call
    every CLI/bench entry point makes, before any jax device use."""
    apply_platform_override()
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
