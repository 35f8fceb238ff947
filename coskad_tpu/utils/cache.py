"""Persistent XLA compilation cache.

Compiles through the remote TPU tunnel take 1-2 minutes per program; the
cache makes repeat CLI runs start in seconds. Safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "COSKAD_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                         ".jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
