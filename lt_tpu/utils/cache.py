"""Persistent XLA compilation cache (critical under axon remote compile).

The TPU environment compiles through a remote service (minutes per large
graph).  JAX's persistent compilation cache eliminates recompiles across
processes; every entry point calls :func:`enable_compilation_cache` first.
"""

from __future__ import annotations

import os


def honor_platform_env():
    """Re-apply an explicit ``JAX_PLATFORMS=cpu`` request.

    The ambient axon sitecustomize imports jax at interpreter startup and its
    ``register()`` resets ``jax_platforms`` to ``"axon,cpu"`` AFTER the env
    var was processed — so a user-forced CPU run would still initialize the
    axon backend on first device probe (and hang whenever the TPU tunnel is
    down).  Call before any ``jax.devices()``; harmless elsewhere.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def enable_compilation_cache(path: str = "/root/.jax_cache"):
    import jax

    honor_platform_env()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax or read-only fs: proceed uncached
