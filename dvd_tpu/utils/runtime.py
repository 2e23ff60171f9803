"""Runtime knobs for TPU execution."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache.  Through the remote-TPU tunnel in
    this environment first compiles of the big perception graphs cost
    minutes; the cache drops warm-process startup to seconds."""
    import jax

    cache_dir = path or os.environ.get(
        "DVD_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
