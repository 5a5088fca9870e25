"""Persistent XLA compilation cache.

ResNet-50/ViT/Farneback programs take tens of seconds to compile on first
use; the on-disk cache makes every later process start warm.
"""

from __future__ import annotations

import hashlib
import os


def _machine_key() -> str:
    """Host-CPU fingerprint for segregating XLA:CPU executables.

    XLA:CPU AOT results bake the compile host's ISA feature set; loading one
    on a host with different features warns about (and can hit) SIGILL, and
    differently-fused executables round differently.  TPU executables have no
    such dependence, so only the CPU backend's cache is keyed by machine.
    """
    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        flags = next((l for l in txt.splitlines() if l.startswith("flags")), "")
    except OSError:
        import platform

        flags = platform.platform()
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "RELAXTPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
    )
    # CPU-backend processes (tests, tooling, hosts without a TPU) get a
    # per-machine subdir; device runs share the base dir (remote TPU compiles
    # take minutes — never invalidate them on a host change).  Keyed on the
    # RESOLVED backend, not JAX_PLATFORMS: the axon plugin ignores that env
    # var, and a no-TPU host defaults to cpu without it being set.  A backend
    # that fails to initialize must not break device-free subcommands here —
    # device commands surface the same error at their first computation.
    try:
        backend = jax.default_backend()
    except RuntimeError:
        backend = None
    if backend == "cpu":
        path = os.path.join(path, f"cpu-{_machine_key()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
