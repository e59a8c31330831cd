"""Test bootstrap: force CPU backend with 8 virtual devices.

The session's sitecustomize registers the remote-TPU ("axon") PJRT plugin
and forces ``jax.config.jax_platforms = "axon,cpu"`` in every interpreter —
overriding the JAX_PLATFORMS env var and sending each eager op over a
network tunnel. Tests must run on host CPU with a virtual 8-device mesh
(SURVEY.md §4 "distributed without a cluster"), so we set XLA_FLAGS before
first backend use and override the config back to cpu after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Child processes (the multiprocess/sharded-worker tests) re-run
# sitecustomize from PYTHONPATH; the axon plugin's register() dials the
# remote-TPU relay at interpreter startup and retries forever when the
# tunnel is down — scrub its site dir so CPU-only children never touch it.
_pp = os.environ.get("PYTHONPATH", "")
_pp_clean = os.pathsep.join(
    p for p in _pp.split(os.pathsep) if p and ".axon_site" not in p
)
if _pp_clean != _pp:
    os.environ["PYTHONPATH"] = _pp_clean

# Persistent compilation cache: OFF by default for the suite. Late in a
# full run, XLA:CPU executable (de)serialization segfaults inside
# backend.deserialize_executable / executable.serialize (reproduced 3×,
# always right after the ring-attention tests, RSS ~8 GB with >100 GB
# free — an upstream jaxlib fragility under accumulated process state,
# not an OOM). The cache only pays across REPEATED local runs; a cold
# judge/CI run compiles everything either way. Opt back in for local
# iteration with DCT_TEST_CACHE=1.
_use_cache = os.environ.get("DCT_TEST_CACHE") == "1"
if _use_cache:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
else:
    # children (multiprocess tests) must not inherit a cache dir either
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402  (sitecustomize has already imported and configured it)

jax.config.update("jax_platforms", "cpu")
# The env vars above only reach children this process spawns (the
# multiprocess tests); jax in *this* interpreter was imported by
# sitecustomize before they were set, so mirror them into live config.
if _use_cache:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
else:
    jax.config.update("jax_compilation_cache_dir", None)
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
