"""Persistent XLA compilation cache + TPU runtime defaults.

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


def setup_tpu_defaults() -> None:
    """Performance defaults for TPU runs: persistent compile cache + the
    hardware RBG PRNG (threefry dropout-mask generation is a measurable cost
    on the VPU; rbg uses the on-chip generator)."""
    import jax

    enable_compile_cache()
    try:
        if jax.default_backend() == "tpu":
            jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
