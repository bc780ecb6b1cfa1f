"""Persistent XLA compilation cache (critical under axon remote compile).

The TPU environment compiles through a remote service (minutes per large
graph).  JAX's persistent compilation cache eliminates recompiles across
processes; every entry point calls :func:`enable_compilation_cache` first.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.jax_cache"):
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax or read-only fs: proceed uncached
