"""Persistent XLA compilation cache.

First compiles of the full-size stages cost minutes (remote TPU compile);
the persistent cache makes every subsequent process start warm.  Called by
bench.py, the trainer CLIs, and __graft_entry__.
"""
from __future__ import annotations

import os


def _host_isa_tag() -> str:
    """Stable fingerprint of the host CPU ISA.  XLA:CPU cache entries are
    AOT machine code; loading artifacts compiled on a machine with different
    vector features executes anyway with only an error log ("could lead to
    execution errors such as SIGILL") — observed here when remote-compiled
    artifacts landed in the shared cache.  Keying the cache dir on the host
    flags confines every entry to the ISA it was built for."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1((platform.machine() + flags).encode()).hexdigest()[:10]


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
    )
    path = os.path.join(path, _host_isa_tag())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover — cache is best-effort
        print(f"[cache] compilation cache unavailable: {e}")
