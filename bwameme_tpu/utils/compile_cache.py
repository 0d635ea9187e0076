"""Persistent XLA compile cache.

The seeding kernels are large programs; on remote-compile TPU services a
cold compile costs minutes. Enabling the JAX persistent compilation cache
makes every compile one-time per (program, backend) — the analog of the
reference shipping pre-built binaries per ISA (src/runsimd.cpp) except the
"binary matrix" is materialized lazily by XLA.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    root = os.environ.get("BWAMEME_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "bwameme_tpu")
    return os.path.join(root, "jax_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently point JAX at a persistent compile cache; returns the
    directory (or None if the cache could not be enabled)."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        or default_cache_dir()
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    try:
        os.makedirs(path, exist_ok=True)
        from jax.experimental.compilation_cache import compilation_cache as cc

        cc.set_cache_dir(path)
        return path
    except Exception:
        return None
