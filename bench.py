"""Benchmark: guided depth-completion throughput on the current accelerator.

Measures the BASELINE.md smoke config — one 640×480 RGB frame + ~500-point
sparse depth, 50-step DDIM with per-step latent guidance (learned affine,
l1+l2 anchor losses), TAESD decode path, bf16 — and prints ONE JSON line:

    {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
     "vs_baseline": R, ...}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is the
ratio to REFERENCE_FRAMES_PER_SEC, a provisional estimate of the reference
pipeline's single-GPU throughput at the same config (3 s/frame class; update
when a measured number lands in BASELINE.md).

Env knobs: BENCH_STEPS (default 50), BENCH_BATCH (default 1),
BENCH_REPEATS (default 3), BENCH_RES (default 768), BENCH_FAST=1
(fast-guidance mode: skip the UNet backward — NOT the parity config; the
headline stays full-parity gradients).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

REFERENCE_FRAMES_PER_SEC = 0.33  # provisional; see BASELINE.md


def main() -> None:
    import jax
    import jax.numpy as jnp

    from depth_completion_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    steps = int(os.environ.get("BENCH_STEPS", "50"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    res = int(os.environ.get("BENCH_RES", "768"))
    fast = os.environ.get("BENCH_FAST", "0") == "1"

    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,  # context width projected to UNet dim
        dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(batch, 480, 640, 3)).astype(np.float32)
    sparse = np.zeros((batch, 480, 640, 1), np.float32)
    idx = rng.choice(480 * 640, size=500, replace=False)
    flat = sparse.reshape(batch, -1)
    flat[:, idx] = rng.uniform(2.0, 80.0, 500).astype(np.float32)
    sparse = flat.reshape(batch, 480, 640, 1)

    cfg = SamplerConfig(
        steps=steps,
        resolution=res,
        train_latents=True,
        train_method="per-step",
        closed_form=False,
        loss_funcs=("l1", "l2"),
        norm="const",
        max_depth=120.0,
        detach_unet_grad=fast,
    )
    fn = jax.jit(guided_sample, static_argnames=("cfg",))

    images_d = jax.device_put(jnp.asarray(images))
    sparse_d = jax.device_put(jnp.asarray(sparse))

    def run_sync():
        """Run and force completion. block_until_ready is a no-op on the
        remote-tunnel backend, so fetch a scalar to synchronize."""
        denses, _ = fn(bundle, images_d, sparse_d, cfg)
        return float(jnp.sum(denses))

    t0 = time.time()
    checksum = run_sync()
    compile_and_first = time.time() - t0

    times = []
    for _ in range(repeats):
        t0 = time.time()
        checksum = run_sync()
        times.append(time.time() - t0)
    del checksum

    best = min(times)
    fps = batch / best
    n_chips = jax.device_count()
    fps_per_chip = fps / max(n_chips, 1)
    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps_per_chip, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps_per_chip / REFERENCE_FRAMES_PER_SEC, 3),
        "config": f"{steps}-step DDIM guided, res {res}, batch {batch}, bf16, "
        f"taesd{', fast-guidance' if fast else ''}",
        "backend": jax.default_backend(),
        "devices": n_chips,
        "compile_s": round(compile_and_first, 1),
        "step_times_s": [round(t, 3) for t in times],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
