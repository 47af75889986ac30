"""Persistent XLA compilation cache.

TPU compiles of the full path-tracing program take minutes (and go through
a remote-compile relay in some environments); the persistent cache makes
every run after the first start in seconds. Call once before the first jit.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/raytracing_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> str | None:
    # The axon remote-compile relay deadlocks when the persistent cache is
    # enabled (measured: a 88 s compile never completes with the cache on).
    # Skip it there; plain TPU/CPU/GPU backends benefit normally.
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
        return None
    path = path or os.environ.get("RT_TPU_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
