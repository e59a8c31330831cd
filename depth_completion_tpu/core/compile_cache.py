"""Persistent XLA compile-cache setup that works even when jax is pre-imported.

The fused 50-step sampling program takes minutes to compile (BENCH_r01:
360 s); the persistent cache makes every run after the first start in
seconds per (geometry, config) signature. Setting the
``JAX_COMPILATION_CACHE_DIR`` environment variable inside a script is not
reliable: site hooks (e.g. a TPU plugin's sitecustomize) may import jax at
interpreter startup, after which jax's config has already snapshotted the
environment and silently ignores later changes — the cache then never
writes. ``jax.config.update`` after import works in both worlds, so every
entry point funnels through here.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_CACHE_DIR = str(Path.home() / ".cache" / "depth_completion_tpu" / "xla")


def enable_compile_cache(
    cache_dir: str | None = None, min_compile_time_secs: float = 2.0
) -> str:
    """Point jax's persistent compilation cache at ``cache_dir``.

    Respects an explicit ``JAX_COMPILATION_CACHE_DIR`` in the environment
    (useful for pointing several processes at one warm volume). Returns the
    directory in effect. Safe to call before or after other jax imports,
    but must run before the first compilation that should be cached.
    """
    import jax

    chosen = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or (
        DEFAULT_CACHE_DIR
    )
    os.environ["JAX_COMPILATION_CACHE_DIR"] = chosen  # for child processes
    jax.config.update("jax_compilation_cache_dir", chosen)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    return chosen
