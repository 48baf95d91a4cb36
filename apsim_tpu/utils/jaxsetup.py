"""Process-wide JAX setup: persistent compilation cache.

The extraction jits compile in ~20-180 s on TPU (one-time per shape bucket);
the persistent cache makes every later process pay ~0 for the same shapes.
Safe to call multiple times.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DONE = False


def _host_fingerprint() -> str:
    """Short id of this host's CPU features.

    XLA:CPU persistently caches AOT results keyed without host ISA features;
    loading a cache written on a machine with different features warns
    "could lead to execution errors such as SIGILL".  Scoping the cache dir
    per CPU-feature-set keeps the cache valid across processes on one machine
    without ever sharing AOT code across incompatible hosts.
    """
    feat = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat += line
                    break
    except OSError:
        feat += platform.processor()
    return hashlib.sha256(feat.encode()).hexdigest()[:10]


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    # APSIM_PLATFORM=cpu forces the backend for headless/CLI subprocesses:
    # on axon hosts a sitecustomize registers the TPU plugin at interpreter
    # start, so the plain JAX_PLATFORMS env var is not honored — only a
    # config update before the first backend touch works (tests/conftest.py
    # does the same in-process; this is the subprocess-reachable hook)
    forced = os.environ.get("APSIM_PLATFORM")
    if forced:
        try:
            jax.config.update("jax_platforms", forced)
        except Exception:
            pass

    path = cache_dir or os.environ.get(
        "APSIM_JAX_CACHE",
        os.path.expanduser(f"~/.cache/apsim_jax/{_host_fingerprint()}"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail on it
    _DONE = True
