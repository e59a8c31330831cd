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

# Persistent compilation cache: OFF by default for the suite.
#
# Root cause of the late-suite segfaults (reproduced 4×, diagnosed with a
# /proc/<pid> monitor): every XLA:CPU compilation adds memory mappings
# (JIT code pages) that are never unmapped — not on executable release,
# not by jax.clear_caches() (measured: 60 compiles → +73 maps, clear → 0
# freed). A single-process full-suite run crosses vm.max_map_count
# (65530) around test 230 (~65.1k maps observed at the crash), after
# which mmap fails and LLVM/XLA segfaults or aborts in whatever path
# needed the next mapping — cache deserialize, cache serialize, or plain
# compile. Fixed by sharding the suite over xdist workers (pyproject
# addopts), each staying far below the limit.
#
# The cache stays off under pytest anyway: (a) a cold judge/CI run
# compiles everything either way, and (b) XLA:CPU cache entries are
# host-feature-specific AOT code — core/compile_cache.py salts the dir
# per host for production, but test tmpdirs don't need the risk. Opt back
# in for repeated local iteration with DCT_TEST_CACHE=1.
_use_cache = os.environ.get("DCT_TEST_CACHE") == "1"
if _use_cache:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
else:
    # children (multiprocess tests) must not inherit a cache dir either,
    # and in-process CLI entry points call enable_compile_cache() — the
    # kill switch makes that a no-op too.
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    os.environ["DCT_NO_COMPILE_CACHE"] = "1"

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
