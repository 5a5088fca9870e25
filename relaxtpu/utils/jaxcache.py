"""Persistent XLA compilation cache.

ResNet-50/ViT/Farneback programs take tens of seconds to compile on first
use; the on-disk cache makes every later process start warm.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "RELAXTPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
