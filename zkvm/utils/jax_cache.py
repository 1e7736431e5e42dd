"""Persistent XLA compilation cache setup.

In this environment JAX's env-var config path (``JAX_COMPILATION_CACHE_DIR``)
does not take effect (the sitecustomize-registered TPU plugin initializes
config before user env is consulted), so the cache must be enabled through
``jax.config.update``.  Prover pipeline graphs take minutes to compile at
large trace lengths; with the cache enabled a fresh process reuses them.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("ZKVM_JAX_CACHE_DIR", "/tmp/zkvm_jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent); returns the dir."""
    import jax

    path = path or _DEFAULT_DIR
    jax.config.update("jax_compilation_cache_dir", path)
    # min_compile_time 0: the per-shape Pallas probe kernels compile in
    # well under a second SERVER-side but cost a full tunnel round trip per
    # kernel per process; excluding them (the old 1.0s threshold) made every
    # fresh process pay minutes of probe recompiles.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
