"""Reproduce the XLA:CPU memory-map leak that capped the test suite.

Every XLA:CPU compilation mmaps JIT code pages that are never unmapped —
not when the executable is released, and not by ``jax.clear_caches()``.
A long-lived process that compiles thousands of programs (e.g. a single
pytest process running this repo's full suite: ~250 maps/test) crosses
``vm.max_map_count`` (default 65530) and the next mmap failure surfaces
as a segfault or abort inside whatever LLVM/XLA path needed the mapping
(cache deserialize, cache serialize, or plain compile — all three were
observed before the diagnosis; see tests/conftest.py).

Run on CPU: ``JAX_PLATFORMS=cpu python scripts/exp_map_leak.py``

Measured here (jax 0.9.0, 2026-08-19): 60 distinct jit compiles add ~73
mappings; clear_caches() + gc frees none. The suite mitigation is process
sharding (pytest-xdist, pyproject addopts); the production mitigation is
that real deployments compile a handful of programs per process, not
thousands.
"""

from __future__ import annotations

import gc


def nmaps() -> int:
    with open("/proc/self/maps", "rb") as f:
        return sum(1 for _ in f)


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    base = nmaps()
    print(f"baseline maps: {base}")

    fns = []
    for i in range(60):
        f = jax.jit(lambda x, i=i: jnp.tanh(x @ x.T) * (i + 1) + jnp.sin(x).sum())
        f(jnp.ones((32 + i, 16)))  # distinct shape per i -> distinct program
        fns.append(f)
    after = nmaps()
    print(f"after 60 distinct compiles: {after} (+{after - base})")

    fns = None
    jax.clear_caches()
    gc.collect()
    final = nmaps()
    print(
        f"after del + clear_caches + gc: {final} "
        f"(freed {after - final} of {after - base})"
    )


if __name__ == "__main__":
    main()
