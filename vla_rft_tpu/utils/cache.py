"""Persistent XLA compilation cache.

First compiles of the full-size stages cost minutes (remote TPU compile);
the persistent cache makes every subsequent process start warm.  Called by
bench.py, the trainer CLIs, and __graft_entry__.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover — cache is best-effort
        print(f"[cache] compilation cache unavailable: {e}")
