"""Serving-stack steady-state benchmark (warm-model HTTP lifecycle).

Measures what the batch CLI cannot: request latency and sustained
throughput of the `serving/` engine once the model is warm — micro-batch
coalescing, padded-row overhead, and the p50/p95 a client actually sees.
Drives the REAL ServingEngine (random weights; latency is
weight-independent) with a closed-loop pool of concurrent clients at one
geometry, after a warmup pass that compiles the program.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/bench_serve.py
Quick CPU smoke: DCT_RANDOM_MODEL_SIZE=tiny JAX_PLATFORMS=cpu \
    SB_RES=64 SB_GEOMETRY=48x64 SB_REQUESTS=6 SB_STEPS=2 \
    PYTHONPATH=. python scripts/bench_serve.py

Env: SB_GEOMETRY (default 480x640), SB_RES (768), SB_STEPS (50),
SB_CLIENTS (concurrent closed-loop clients, default 8), SB_REQUESTS
(total, default 24), SB_MAX_BATCH (8 — the bench.py sweet spot),
SB_MAX_DELAY_MS (25).

Prints one JSON line: requests/s, per-request p50/p95 latency, batch
fill efficiency (batched rows / (batched + padded)).
"""

from __future__ import annotations

import json
import os
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

import numpy as np

GEOMETRY = os.environ.get("SB_GEOMETRY", "480x640")
RES = int(os.environ.get("SB_RES", "768"))
STEPS = int(os.environ.get("SB_STEPS", "50"))
CLIENTS = int(os.environ.get("SB_CLIENTS", "8"))
REQUESTS = int(os.environ.get("SB_REQUESTS", "24"))
MAX_BATCH = int(os.environ.get("SB_MAX_BATCH", "8"))
MAX_DELAY_MS = float(os.environ.get("SB_MAX_DELAY_MS", "25"))


def main() -> None:
    import jax

    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.models import registry
    from depth_completion_tpu.pipeline import DepthCompletionPipeline
    from depth_completion_tpu.serving import ServeRequest, ServingEngine

    import jax.numpy as jnp

    h, w = (int(x) for x in GEOMETRY.lower().split("x"))
    if os.environ.get("DCT_RANDOM_MODEL_SIZE") == "tiny":
        bundle = make_random_bundle(seed=0, vae_kind="tiny", dtype=np.float32)
    else:
        # same bundle class as bench.py: bf16 weights, tiny text tower
        # (the 2-token context is cached; full CLIP only adds HBM weight)
        bundle = make_random_bundle(
            seed=0,
            unet_config=registry.MARIGOLD_UNET_CONFIG,
            vae_kind="tiny",
            vae_config=registry.TAESD_CONFIG,
            text_config=registry.TINY_TEXT_CONFIG,
            dtype=jnp.bfloat16,
        )
    engine = ServingEngine(
        DepthCompletionPipeline(bundle),
        dict(
            max_depth=120.0,
            steps=STEPS,
            resolution=RES,
            norm="const",
            loss_funcs=("l1", "l2"),
        ),
        max_batch=MAX_BATCH,
        max_delay_ms=MAX_DELAY_MS,
    )

    t0 = time.monotonic()
    engine.warmup([(h, w)])
    warm_s = time.monotonic() - t0

    rng = np.random.default_rng(0)
    frames = []
    for i in range(CLIENTS):
        img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
        sparse = np.zeros((h, w, 1), np.float32)
        idx = rng.choice(h * w, size=max(16, h * w // 200), replace=False)
        sparse.reshape(-1)[idx] = rng.uniform(2.0, 100.0, idx.size)
        frames.append((img, sparse))

    latencies: list[float] = []
    lat_lock = threading.Lock()
    counter = {"left": REQUESTS}

    def client(i: int) -> None:
        img, sparse = frames[i]
        while True:
            with lat_lock:
                if counter["left"] <= 0:
                    return
                counter["left"] -= 1
            t = time.monotonic()
            req = engine.submit(ServeRequest(image=img, sparse=sparse))
            dense = req.wait(timeout=1200)
            assert np.isfinite(dense).all()
            with lat_lock:
                latencies.append(time.monotonic() - t)

    t1 = time.monotonic()
    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(CLIENTS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    span = time.monotonic() - t1
    stats = engine.stats()
    engine.shutdown()

    lats = sorted(latencies)
    rows = stats["batched_rows"] + stats["padded_rows"]
    print(
        json.dumps(
            {
                "metric": "serve_requests_per_sec",
                "value": round(len(lats) / span, 4),
                "unit": "req/s",
                "config": (
                    f"{STEPS}-step guided, res {RES}, geometry {GEOMETRY}, "
                    f"{CLIENTS} clients, max_batch {MAX_BATCH}"
                ),
                "backend": jax.default_backend(),
                "requests": len(lats),
                "latency_s_p50": round(lats[len(lats) // 2], 3),
                "latency_s_p95": round(lats[int(len(lats) * 0.95)], 3),
                "batches": stats["batches"],
                "batch_fill": round(stats["batched_rows"] / rows, 3)
                if rows
                else None,
                "warmup_s": round(warm_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
