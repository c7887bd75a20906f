"""Persistent XLA compilation cache.

First compile of the full cascade is 20-40 s per resolution; the persistent
cache makes subsequent processes (per-scene test drivers, restarted training)
reuse compiled executables.  Call once at driver startup.
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "mvster_tpu_xla"
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or unsupported backend: silently skip
    return cache_dir
