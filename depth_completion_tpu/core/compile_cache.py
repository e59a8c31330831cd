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

import hashlib
import os
import platform
from pathlib import Path

DEFAULT_CACHE_DIR = str(Path.home() / ".cache" / "depth_completion_tpu" / "xla")


def _host_fingerprint() -> str:
    """Short hash of the host CPU's ISA feature set (+ jaxlib version).

    XLA:CPU cache entries are AOT-compiled machine code whose cache key does
    NOT include the compiling host's CPU features; an entry written on one
    machine and deserialized on another with a different ISA executes
    illegal instructions (the loader itself warns "could lead to execution
    errors such as SIGILL"). Salting the cache directory per host
    fingerprint makes foreign entries unreachable instead of fatal when a
    cache volume moves between machines. Note: jaxlib 0.9.0's AOT loader
    prints that warning even for same-host reloads — it compares the saved
    feature string (which includes compiler tuning pseudo-features like
    +prefer-no-scatter) against LLVM host detection (which never reports
    them); same-host reloads are fine despite the noise.
    """
    try:
        import jaxlib

        ver = getattr(jaxlib, "__version__", "")
    except Exception:
        ver = ""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.strip()
                    break
    except OSError:
        pass
    digest = hashlib.sha1(
        f"{platform.machine()}|{ver}|{flags}".encode()
    ).hexdigest()[:10]
    return f"host-{digest}"


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

    if os.environ.get("DCT_NO_COMPILE_CACHE") == "1":
        # Kill switch (the test suite sets it: XLA:CPU executable
        # serialize/deserialize segfaults under accumulated process state,
        # see tests/conftest.py).
        jax.config.update("jax_compilation_cache_dir", None)
        return ""
    chosen = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or (
        DEFAULT_CACHE_DIR
    )
    salt = _host_fingerprint()
    if os.path.basename(chosen) != salt:  # don't double-salt via env inherit
        chosen = os.path.join(chosen, salt)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = chosen  # for child processes
    jax.config.update("jax_compilation_cache_dir", chosen)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    return chosen
