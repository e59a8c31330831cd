"""Data-parallel scaling benchmark: frames/s at 1 vs N devices.

On a multi-chip TPU slice this measures true scaling efficiency (BASELINE.md
target: ≥90% frames/s efficiency). On a single-chip or CPU host it runs the
same sharded program over the virtual device mesh — a functional check of
the scaling path plus a throughput-vs-batch curve.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py          # virtual mesh check
    python scripts/bench_scaling.py              # real devices

Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from depth_completion_tpu.core.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from depth_completion_tpu.core.mesh import AXIS_DATA, AXIS_MODEL
    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.parallel.sharding import shard_batch, shard_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    full_size = os.environ.get("BENCH_FULL", "0") == "1"
    steps = int(os.environ.get("BENCH_STEPS", "4" if not full_size else "50"))
    frames_per_device = int(os.environ.get("BENCH_FPD", "1"))

    if full_size:
        bundle = make_random_bundle(
            seed=0,
            unet_config=registry.MARIGOLD_UNET_CONFIG,
            vae_kind="tiny",
            vae_config=registry.TAESD_CONFIG,
            text_config=registry.TINY_TEXT_CONFIG,
            dtype=jnp.bfloat16,
        )
        h, w, res = 480, 640, 768
    else:
        bundle = make_random_bundle(seed=0)
        h, w, res = 48, 64, 64

    devices = jax.devices()
    fn = jax.jit(guided_sample, static_argnames=("cfg",))
    cfg = SamplerConfig(steps=steps, resolution=res, norm="const", closed_form=False)

    results = []
    sizes = [n for n in (1, 2, 4, 8, len(devices)) if n <= len(devices)]
    for n_dev in sorted(set(sizes)):
        mesh = Mesh(np.asarray(devices[:n_dev]).reshape(n_dev, 1), (AXIS_DATA, AXIS_MODEL))
        b = shard_bundle(mesh, bundle)
        batch = n_dev * frames_per_device
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(0, 255, size=(batch, h, w, 3)), jnp.float32
        )
        sparse_np = np.zeros((batch, h, w, 1), np.float32)
        sparse_np[:, ::8, ::8, 0] = 10.0
        images, sparse = shard_batch(mesh, images, jnp.asarray(sparse_np))

        def run():
            denses, _ = fn(b, images, sparse, cfg)
            return float(jnp.sum(denses))

        run()  # compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        fps = batch / min(ts)
        results.append({"devices": n_dev, "frames_per_sec": round(fps, 3)})

    base = results[0]["frames_per_sec"]
    for r in results:
        r["scaling_efficiency"] = round(
            r["frames_per_sec"] / (base * r["devices"]), 3
        )
        print(json.dumps(r))

    # ----- ring-attention (sequence-parallel) scaling ---------------------
    # The --native-res mode: batch replicated, self-attention sequence
    # sharded over the data axis with KV rotating around the ring
    # (ops/ring_attention.py). Pre-written so a real pod slice can measure
    # ring scaling within minutes (VERDICT r3 #10); on one chip it degrades
    # to a self-loop ring (scripts/exp_ring_tpu.py validates that lowering).
    if os.environ.get("BENCH_RING", "1") == "1":
        import dataclasses

        ring_results = []
        for n_dev in sorted(set(sizes)):
            mesh = Mesh(
                np.asarray(devices[:n_dev]).reshape(n_dev, 1),
                (AXIS_DATA, AXIS_MODEL),
            )
            b = shard_bundle(mesh, bundle)
            ring_cfg = dataclasses.replace(cfg, ring_mesh=mesh)
            rng = np.random.default_rng(0)
            images = jnp.asarray(
                rng.uniform(0, 255, size=(1, h, w, 3)), jnp.float32
            )
            sparse_np = np.zeros((1, h, w, 1), np.float32)
            sparse_np[:, ::8, ::8, 0] = 10.0
            sparse = jnp.asarray(sparse_np)

            def run_ring():
                denses, _ = fn(b, images, sparse, ring_cfg)
                return float(jnp.sum(denses))

            run_ring()  # compile
            ts = []
            for _ in range(3):
                t0 = time.time()
                run_ring()
                ts.append(time.time() - t0)
            ring_results.append(
                {
                    "mode": "ring",
                    "devices": n_dev,
                    "frames_per_sec": round(1.0 / min(ts), 3),
                }
            )
        ring_base = ring_results[0]["frames_per_sec"]
        for r in ring_results:
            # sequence parallelism targets memory capacity, not throughput:
            # efficiency here is time-vs-1-device (1.0 = free sharding)
            r["vs_single_device"] = round(r["frames_per_sec"] / ring_base, 3)
            print(json.dumps(r))


if __name__ == "__main__":
    main()
