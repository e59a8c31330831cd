"""Device-op trace of the real guided sampling program (bench config).

Runs ``guided_sample`` at the bench smoke config for BENCH_STEPS (default 4)
steps, traces one execution with jax.profiler, and aggregates device-track
events by HLO-op name — the per-step anatomy of the shipped program rather
than isolated UNet/decode pieces (scripts/profile_trace.py).

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_guided.py
"""

import glob
import gzip
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np
import jax
import jax.numpy as jnp

from depth_completion_tpu.core.compile_cache import enable_compile_cache

enable_compile_cache()

from depth_completion_tpu.models import registry
from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

STEPS = int(os.environ.get("BENCH_STEPS", "4"))


def main():
    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, size=(1, 480, 640, 3)).astype(np.float32)
    )
    sparse = np.zeros((1, 480 * 640), np.float32)
    idx = rng.choice(480 * 640, size=500, replace=False)
    sparse[:, idx] = rng.uniform(2.0, 80.0, 500).astype(np.float32)
    sparse = jnp.asarray(sparse.reshape(1, 480, 640, 1))

    cfg = SamplerConfig(
        steps=STEPS,
        resolution=768,
        train_latents=True,
        train_method="per-step",
        closed_form=False,
        loss_funcs=("l1", "l2"),
        norm="const",
        max_depth=120.0,
    )
    fn = jax.jit(guided_sample, static_argnames=("cfg",))

    def run():
        denses, _ = fn(bundle, images, sparse, cfg)
        return float(jnp.sum(denses))

    t0 = time.time()
    run()
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    run()
    wall = time.time() - t0
    print(f"steady run ({STEPS} steps): {wall*1000:.1f} ms", flush=True)

    logdir = "/tmp/dct_trace_guided"
    with jax.profiler.trace(logdir):
        run()
        time.sleep(0.5)

    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]

    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    by_name = {}
    for ev in events:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "Chip" not in pname and "XLA" not in pname:
            continue
        name = ev.get("name", "?")
        by_name.setdefault(name, [0.0, 0])
        by_name[name][0] += ev.get("dur", 0) / 1e3
        by_name[name][1] += 1
    total = sum(v[0] for v in by_name.values())
    print(f"\ntracks: {sorted(set(pid_names.values()))}")
    print(f"total device op time ({STEPS} steps): {total:.2f} ms"
          f"  ({total/STEPS:.2f} ms/step)\n")
    for name, (ms, cnt) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:70]:
        print(f"{ms/STEPS:9.3f} ms/step  x{cnt:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
