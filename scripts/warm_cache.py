"""AOT-prime the persistent XLA compile cache for the standard geometries.

A cold production run pays minutes of XLA compilation per (aspect-ratio,
batch, steps) signature (BENCH_r01: 360 s for the smoke program). This
script compiles the standard dataset geometries ahead of time into
JAX_COMPILATION_CACHE_DIR so real runs start in seconds on a warm cache
volume (VERDICT round-1, item 9; the Dockerfile mounts the cache dir).

Geometries primed (processing resolution 768, the reference default):
  - smoke/NYUv2-class 640x480  -> 96x72 latent
  - KITTI-DC          1216x352 -> 96x28 latent
  - square            768x768  -> 96x96 latent

Run: PYTHONPATH=.:/root/.axon_site python scripts/warm_cache.py
Env: WARM_BATCHES (default "1"), WARM_STEPS (default 50), WARM_CARRY=1
     (also prime the batch-1 temporal-carry / serving-session program),
     WARM_ENSEMBLE (default ""), WARM_PARALLEL (default 1: compile up to
     N distinct programs concurrently — XLA compilation releases the GIL;
     wall-clock approaches the slowest program instead of the sum),
     JAX_COMPILATION_CACHE_DIR (default /tmp/dct_xla_cache).
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

import jax
import jax.numpy as jnp

from depth_completion_tpu.core.compile_cache import enable_compile_cache

enable_compile_cache()

from depth_completion_tpu.models import registry
from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

GEOMETRIES = {
    "nyu-640x480": (480, 640),
    "kitti-1216x352": (352, 1216),
    "square-768": (768, 768),
}


def main() -> None:
    batches = [int(b) for b in os.environ.get("WARM_BATCHES", "1").split(",")]
    steps = int(os.environ.get("WARM_STEPS", "50"))
    ens = os.environ.get("WARM_ENSEMBLE", "")

    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16,
    )
    # Match the predict CLI's *default* coerced config (norm=const,
    # loss l1+l2) so a primed volume covers real runs and bench.py —
    # a different norm/loss set is a different program and cache key.
    cfg = SamplerConfig(
        steps=steps,
        resolution=768,
        train_latents=True,
        train_method="per-step",
        closed_form=False,
        loss_funcs=("l1", "l2"),
        norm=os.environ.get("WARM_NORM", "const"),
        max_depth=120.0,
    )
    fn = jax.jit(guided_sample, static_argnames=("cfg",))

    from depth_completion_tpu.ops.resize import latent_size

    warm_carry = os.environ.get("WARM_CARRY", "0") == "1"
    parallel = int(os.environ.get("WARM_PARALLEL", "1"))

    jobs: list[tuple[str, tuple]] = []  # (label, lower-args)
    for name, (h, w) in GEOMETRIES.items():
        for n in batches:
            jobs.append(
                (
                    f"{name} batch={n}",
                    (
                        bundle,
                        jnp.zeros((n, h, w, 3), jnp.float32),
                        jnp.zeros((n, h, w, 1), jnp.float32),
                        cfg,
                    ),
                )
            )
        if warm_carry:
            # temporal-carry program (use_prev_latent / serving sessions,
            # batch 1 — the coerced batch size for that mode): a distinct
            # jit signature, otherwise the second video frame compiles cold
            eh, ew = latent_size((h, w), cfg.resolution, 8)
            jobs.append(
                (
                    f"{name} carry",
                    (
                        bundle,
                        jnp.zeros((1, h, w, 3), jnp.float32),
                        jnp.zeros((1, h, w, 1), jnp.float32),
                        cfg,
                        jnp.zeros((1, eh, ew, 4), jnp.float32),
                    ),
                )
            )

    def prime(job: tuple[str, tuple]) -> None:
        label, args = job
        t0 = time.time()
        compiled = fn.lower(*args).compile()
        print(f"{label}: compiled in {time.time() - t0:.1f}s "
              f"(flops {compiled.cost_analysis().get('flops', 0) / 1e12:.2f}T)",
              flush=True)

    if parallel > 1:
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=parallel) as ex:
            list(ex.map(prime, jobs))
        print(f"{len(jobs)} programs primed in {time.time() - t0:.1f}s "
              f"(parallel={parallel})", flush=True)
    else:
        for job in jobs:
            prime(job)
    if ens:
        from depth_completion_tpu.parallel.ensemble import ensemble_sample

        e = int(ens)
        efn = jax.jit(
            ensemble_sample,
            static_argnames=("cfg", "ensemble_size", "reduce", "mesh"),
        )
        h, w = GEOMETRIES["kitti-1216x352"]
        images = jnp.zeros((1, h, w, 3), jnp.float32)
        sparses = jnp.zeros((1, h, w, 1), jnp.float32)
        t0 = time.time()
        efn.lower(
            bundle, images, sparses, cfg=cfg, ensemble_size=e,
            reduce="median", mesh=None,
        ).compile()
        print(f"kitti ensemble={e}: compiled in {time.time() - t0:.1f}s",
              flush=True)
    print(f"cache dir: {os.environ['JAX_COMPILATION_CACHE_DIR']}", flush=True)


if __name__ == "__main__":
    main()
