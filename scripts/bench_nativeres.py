"""Native-resolution (no-downsample) mode: first single-chip perf rows
(VERDICT r4 #6).

The ring/native-res path (SURVEY §5 long-context stretch) is parity-tested
and Mosaic-lowering-validated (scripts/exp_ring_tpu.py) but had no measured
throughput at a real no-downsample geometry. This measures, on one chip at
KITTI geometry (352x1216):

- ``kitti-768``   — the downsampled default (res 768 -> 28x96 latents),
  the baseline the mode is compared against;
- ``kitti-native``— res 1216: processing at native resolution
  (44x152 latents, S=6688 stage-0 self-attention) on the plain flash path;
- ``kitti-native-ring1`` — same geometry through the sequence-sharded ring
  with a 1-device mesh (p=1 ring: one full-sequence flash call + merge
  arithmetic + shard_map plumbing), costing the ring machinery itself so
  the mode's overhead is known before a pod slice ever materializes.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/bench_nativeres.py
Env: NR_BATCH (default 8; halved automatically on RESOURCE_EXHAUSTED),
NR_REPEATS (2), NR_MODES (csv filter), NR_BUDGET_S (7200).
Output: one JSON line per mode + a markdown table.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

import numpy as np

T0 = time.time()


def log(msg: str) -> None:
    print(f"[nativeres +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from depth_completion_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from depth_completion_tpu.core.mesh import AXIS_DATA, AXIS_MODEL
    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    batch = int(os.environ.get("NR_BATCH", "8"))
    repeats = int(os.environ.get("NR_REPEATS", "2"))
    budget_s = float(os.environ.get("NR_BUDGET_S", "7200"))

    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16,
    )

    h, w = 352, 1216  # KITTI-DC crop
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(batch, h, w, 3)).astype(np.float32)
    sparse = np.zeros((batch, h, w, 1), np.float32)
    idx = rng.choice(h * w, size=2000, replace=False)  # LiDAR-class density
    flat = sparse.reshape(batch, -1)
    flat[:, idx] = rng.uniform(2.0, 80.0, 2000).astype(np.float32)
    sparse = flat.reshape(batch, h, w, 1)

    ring1 = Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1), (AXIS_DATA, AXIS_MODEL)
    )
    base = SamplerConfig(
        steps=50,
        resolution=768,
        train_latents=True,
        train_method="per-step",
        closed_form=False,
        loss_funcs=("l1", "l2"),
        norm="const",
        max_depth=120.0,
        # native-res activation maps exceed the batch-12-equivalent
        # threshold; let the auto heuristic decide per geometry
        remat_unet="auto",
    )
    modes = {
        "kitti-768": base,
        "kitti-native": dataclasses.replace(base, resolution=w),
        "kitti-native-ring1": dataclasses.replace(
            base, resolution=w, ring_mesh=ring1, ring_axis=AXIS_DATA
        ),
    }
    only = os.environ.get("NR_MODES")
    if only:
        keep = [m.strip() for m in only.split(",")]
        modes = {k: v for k, v in modes.items() if k in keep}

    fn = jax.jit(guided_sample, static_argnames=("cfg",))

    rows = []
    for name, cfg in modes.items():
        if rows and time.time() - T0 > budget_s:
            rows.append({"mode": name, "skipped": "budget"})
            continue
        b = batch
        while True:
            imgs = jax.device_put(jnp.asarray(images[:b]))
            sps = jax.device_put(jnp.asarray(sparse[:b]))

            def run_sync():
                denses, _ = fn(bundle, imgs, sps, cfg)
                return float(jnp.sum(denses))

            log(f"{name}: compile + first run (batch {b})")
            try:
                # bounded retry against transient tunnel errors (bench._retry)
                from bench import _retry

                t0 = time.time()
                _retry(run_sync, label=name)
                compile_first = time.time() - t0
                times = []
                for _ in range(repeats):
                    t0 = time.time()
                    _retry(run_sync, label=name)
                    times.append(time.time() - t0)
                break
            except Exception as exc:
                msg = f"{type(exc).__name__}: {exc}"
                if (
                    "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                ) and b > 1:
                    log(f"{name}: OOM at batch {b}, halving")
                    b //= 2
                    continue
                log(f"{name}: FAILED {msg[:200]}")
                rows.append({"mode": name, "error": msg[:200]})
                times = None
                break
        if times is None:
            continue
        row = {
            "mode": name,
            "batch": b,
            "resolution": cfg.resolution,
            "frames_per_sec_per_chip": round(
                b / min(times) / jax.device_count(), 4
            ),
            "compile_plus_first_s": round(compile_first, 1),
            "frame_times_s": [round(t, 3) for t in times],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| mode | res | batch | f/s/chip | vs kitti-768 |")
    print("|---|---|---|---|---|")
    ref = next(
        (r for r in rows if r["mode"] == "kitti-768" and "frames_per_sec_per_chip" in r),
        None,
    )
    for r in rows:
        if "frames_per_sec_per_chip" not in r:
            print(f"| {r['mode']} | | {r.get('error', r.get('skipped'))} | | |")
            continue
        rel = (
            f"{r['frames_per_sec_per_chip'] / ref['frames_per_sec_per_chip']:.2f}x"
            if ref
            else "—"
        )
        print(
            f"| {r['mode']} | {r['resolution']} | {r['batch']} | "
            f"{r['frames_per_sec_per_chip']} | {rel} |"
        )


if __name__ == "__main__":
    main()
