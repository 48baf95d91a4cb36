"""Process-wide JAX setup: persistent compilation cache.

The extraction jits compile in ~20-180 s on TPU (one-time per shape bucket);
the persistent cache makes every later process pay ~0 for the same shapes.
Safe to call multiple times.
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    path = cache_dir or os.environ.get(
        "APSIM_JAX_CACHE", os.path.expanduser("~/.cache/apsim_jax")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail on it
    _DONE = True
