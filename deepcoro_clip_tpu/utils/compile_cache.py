"""Persistent XLA compilation cache.

First compilation of the flagship train step takes tens of minutes through
the remote-compile tunnel; the on-disk cache makes every later process start
in seconds. Safe to call multiple times.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache_dir = Path(
        path
        or os.environ.get("DEEPCORO_JAX_CACHE", "/root/.cache/deepcoro_jax_cache")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
