"""Serving-stack steady-state benchmark (warm-model HTTP lifecycle).

Measures what the batch CLI cannot: request latency and sustained
throughput of the `serving/` engine once the model is warm — micro-batch
coalescing, padded-row overhead, and the p50/p95 a client actually sees.
Drives the REAL ServingEngine (random weights; latency is
weight-independent) with a closed-loop pool of concurrent clients, after a
warmup pass that compiles every program.

Mixed-geometry mode: pass SB_GEOMETRY as a comma list (e.g.
"480x640,352x1216") to split the client pool across geometries — the
scenario that exercises the per-geometry queues + round-robin dispatch
(serving/engine.py). The JSON then carries per-geometry p50/p95 and the
head-of-line check: minority-geometry p95 must sit in the same class as
the majority's, not behind a full majority drain.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/bench_serve.py
Quick CPU smoke: DCT_RANDOM_MODEL_SIZE=tiny JAX_PLATFORMS=cpu \
    SB_RES=64 SB_GEOMETRY=48x64,64x48 SB_REQUESTS=8 SB_STEPS=2 \
    PYTHONPATH=. python scripts/bench_serve.py

Env: SB_GEOMETRY (default 480x640; comma list for mixed), SB_RES (768),
SB_STEPS (50), SB_CLIENTS (concurrent closed-loop clients, default 8),
SB_REQUESTS (total, default 24), SB_MAX_BATCH (8 — the bench.py sweet
spot), SB_MAX_DELAY_MS (25), SB_MAX_PROGRAMS (LRU program bound, default
unbounded).

Prints one JSON line: requests/s, per-request p50/p95 latency, batch
fill efficiency (batched rows / (batched + padded)), per-geometry stats.
"""

from __future__ import annotations

import json
import os
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

import numpy as np

GEOMETRIES = [
    tuple(int(x) for x in g.lower().split("x"))
    for g in os.environ.get("SB_GEOMETRY", "480x640").split(",")
]
RES = int(os.environ.get("SB_RES", "768"))
STEPS = int(os.environ.get("SB_STEPS", "50"))
CLIENTS = int(os.environ.get("SB_CLIENTS", "8"))
REQUESTS = int(os.environ.get("SB_REQUESTS", "24"))
MAX_BATCH = int(os.environ.get("SB_MAX_BATCH", "8"))
MAX_DELAY_MS = float(os.environ.get("SB_MAX_DELAY_MS", "25"))
MAX_PROGRAMS = (
    int(os.environ["SB_MAX_PROGRAMS"])
    if os.environ.get("SB_MAX_PROGRAMS")
    else None
)
# SB_TIERED=1: tiered warmup — traffic opens on fast-compiled tier-0
# programs while full-effort programs promote in the background
# (engine.warmup(tiered=True); PERF.md round-4). The JSON then reports
# time-to-first-response right after warmup. SB_WARM_PARALLEL=N overlaps
# distinct warmup program compiles.
TIERED = os.environ.get("SB_TIERED", "0") == "1"
WARM_PARALLEL = int(os.environ.get("SB_WARM_PARALLEL", "1"))


def main() -> None:
    import jax

    from depth_completion_tpu.core.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax.numpy as jnp

    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline import DepthCompletionPipeline
    from depth_completion_tpu.serving import ServeRequest, ServingEngine

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
        DepthCompletionPipeline(bundle, max_programs=MAX_PROGRAMS),
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
    engine.warmup(GEOMETRIES, parallel=WARM_PARALLEL, tiered=TIERED)
    warm_s = time.monotonic() - t0

    rng = np.random.default_rng(0)

    # time-to-first-response: first request the engine serves after
    # warmup returns (tier-0 program when SB_TIERED=1)
    h0, w0 = GEOMETRIES[0]
    img0 = rng.uniform(0, 255, size=(h0, w0, 3)).astype(np.float32)
    sp0 = np.zeros((h0, w0, 1), np.float32)
    sp0[h0 // 2, w0 // 2, 0] = 5.0
    sp0[h0 // 4, w0 // 4, 0] = 50.0
    t_first = time.monotonic()
    first = engine.complete(img0, sp0, timeout=1200)
    ttfr_s = time.monotonic() - t_first
    assert np.isfinite(first).all()
    frames = []
    for i in range(CLIENTS):
        h, w = GEOMETRIES[i % len(GEOMETRIES)]
        img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
        sparse = np.zeros((h, w, 1), np.float32)
        idx = rng.choice(h * w, size=max(16, h * w // 200), replace=False)
        sparse.reshape(-1)[idx] = rng.uniform(2.0, 100.0, idx.size)
        frames.append(((h, w), img, sparse))

    latencies: dict[tuple[int, int], list[float]] = {g: [] for g in GEOMETRIES}
    lat_lock = threading.Lock()
    counter = {"left": REQUESTS}

    def client(i: int) -> None:
        geo, img, sparse = frames[i]
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
                latencies[geo].append(time.monotonic() - t)

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
    # Tiered: wait for background full-effort promotion to finish and time
    # it from warmup-return — the window during which traffic pays tier-0
    # step cost. With SB_WARM_PARALLEL=N promotion compiles overlap
    # (engine._promote_full_programs inherits parallel), so promote_s
    # should drop ~Nx vs serial (VERDICT r4 #5a done-criterion).
    promote_s = None
    if TIERED and os.environ.get("SB_WAIT_PROMOTE", "1") == "1":
        deadline = time.monotonic() + float(
            os.environ.get("SB_PROMOTE_TIMEOUT_S", "3600")
        )
        while time.monotonic() < deadline:
            with engine._tier_lock:
                if engine._tier0_pipe is None:
                    promote_s = time.monotonic() - t0 - warm_s
                    break
            # a permanently-failed signature keeps tier-0 alive by design;
            # once the promotion thread has exited, waiting longer cannot
            # change anything — stop instead of spinning out the timeout
            if not any(
                t.name == "dct-serving-tier-promote" and t.is_alive()
                for t in threading.enumerate()
            ):
                break
            time.sleep(1.0)
        stats = engine.stats()  # re-snapshot: promotions landed during wait
    engine.shutdown()

    def pctl(xs: list[float], q: float) -> float:
        return round(sorted(xs)[min(int(len(xs) * q), len(xs) - 1)], 3)

    all_lats = [x for xs in latencies.values() for x in xs]
    rows = stats["batched_rows"] + stats["padded_rows"]
    out = {
        "metric": "serve_requests_per_sec",
        "value": round(len(all_lats) / span, 4),
        "unit": "req/s",
        "config": (
            f"{STEPS}-step guided, res {RES}, geometries "
            f"{'+'.join(f'{h}x{w}' for h, w in GEOMETRIES)}, "
            f"{CLIENTS} clients, max_batch {MAX_BATCH}"
        ),
        "backend": jax.default_backend(),
        "requests": len(all_lats),
        "latency_s_p50": pctl(all_lats, 0.5),
        "latency_s_p95": pctl(all_lats, 0.95),
        "batches": stats["batches"],
        "batch_fill": round(stats["batched_rows"] / rows, 3) if rows else None,
        "warmup_s": round(warm_s, 1),
        "ttfr_s": round(ttfr_s, 2),  # first response after warmup returned
    }
    if TIERED:
        out["tiered"] = True
        out["warmup_parallel"] = WARM_PARALLEL
        if promote_s is not None:
            # wall time from warmup-return until every signature serves
            # its full-effort program (tier-0 dropped)
            out["promote_s"] = round(promote_s, 1)
        else:
            out["tier_promoted"] = stats.get("tier_promoted")
    if len(GEOMETRIES) > 1:
        out["per_geometry"] = {
            f"{h}x{w}": {
                "requests": len(xs),
                "p50": pctl(xs, 0.5),
                "p95": pctl(xs, 0.95),
            }
            for (h, w), xs in latencies.items()
            if xs
        }
        if "pipe_programs" in stats:
            out["pipe_programs"] = stats["pipe_programs"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
