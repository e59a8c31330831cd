"""Speed/quality frontier of the fast sampling modes (VERDICT r4 #3).

The composition-floor analysis (BASELINE.md round-4) concluded the fused
parity program sits within ~1% of its floor — the remaining perf levers are
ALGORITHMIC: fast-guidance (``detach_unet_grad``: guidance gradients stop at
the scheduler preview instead of flowing through the UNet,
pipeline/sampler.py:148-154), the guided-LCM few-step path (sched/lcm.py,
anchored through the closed-form affine solve), and reduced DDIM step
counts. Their *mechanics* are parity-tested; this script quantifies their
*quality cost*: each mode runs the bench config (full-size Marigold-geometry
random bundle, the offline stand-in for the real checkpoints — BASELINE.md)
on the same frames/seeds as the full-parity 50-step reference, and reports

- frames/s/chip (median of repeats, batch-amortized like bench.py),
- MAE / RMSE vs the full-parity output (drift: how far the fast mode's
  depth map moves from the parity mode's),
- sparse-anchor MAE (|dense - sparse| at the guidance points, in metric
  units): an absolute consistency measure that is meaningful for the
  reference mode itself — guided modes should pin these points.

Caveat (documented everywhere these numbers are quoted): with random
weights the drift measures the ALGORITHMIC deviation of the sampler paths
given the same model function — the real-checkpoint RMSE cost on KITTI/NYU
needs the pinned weights (env-blocked, BASELINE.md). Mode ordering and
relative magnitudes are the decision signal, not absolute RMSE.

Run (TPU): PYTHONPATH=. python scripts/frontier.py
Env: FRONTIER_MODES (csv), FRONTIER_BATCH (8), FRONTIER_REPEATS (2),
FRONTIER_BUDGET_S (7200) — stop compiling new modes past the budget,
FRONTIER_RES (768), FRONTIER_REF_STEPS (50).
Output: one JSON line per mode (stderr progress), then a markdown table.
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
    print(f"[frontier +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from depth_completion_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    batch = int(os.environ.get("FRONTIER_BATCH", "8"))
    repeats = int(os.environ.get("FRONTIER_REPEATS", "2"))
    budget_s = float(os.environ.get("FRONTIER_BUDGET_S", "7200"))
    res = int(os.environ.get("FRONTIER_RES", "768"))
    ref_steps = int(os.environ.get("FRONTIER_REF_STEPS", "50"))

    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16,
    )

    # bench.py's exact frames/sparse seeds, so numbers line up with BENCH
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(batch, 480, 640, 3)).astype(np.float32)
    sparse = np.zeros((batch, 480, 640, 1), np.float32)
    idx = rng.choice(480 * 640, size=500, replace=False)
    flat = sparse.reshape(batch, -1)
    flat[:, idx] = rng.uniform(2.0, 80.0, 500).astype(np.float32)
    sparse = flat.reshape(batch, 480, 640, 1)

    base = SamplerConfig(
        steps=ref_steps,
        resolution=res,
        train_latents=True,
        train_method="per-step",
        closed_form=False,
        loss_funcs=("l1", "l2"),
        norm="const",
        max_depth=120.0,
    )
    # ordered by decision value; the ref mode must come first
    modes: dict[str, SamplerConfig] = {
        "full-50": base,
        "fast-50": dataclasses.replace(base, detach_unet_grad=True),
        "lcm-4": dataclasses.replace(
            base, steps=4, scheduler="lcm", closed_form=True
        ),
        "ddim-25": dataclasses.replace(base, steps=25),
        "ddim-10": dataclasses.replace(base, steps=10),
        "lcm-8": dataclasses.replace(
            base, steps=8, scheduler="lcm", closed_form=True
        ),
    }
    only = os.environ.get("FRONTIER_MODES")
    if only:
        keep = [m.strip() for m in only.split(",")]
        modes = {k: v for k, v in modes.items() if k in keep}

    fn = jax.jit(guided_sample, static_argnames=("cfg",))
    images_d = jax.device_put(jnp.asarray(images))
    sparse_d = jax.device_put(jnp.asarray(sparse))
    valid = sparse > 0

    def run_sync(cfg) -> np.ndarray:
        denses, _ = fn(bundle, images_d, sparse_d, cfg)
        return np.asarray(denses)  # materialize = sync (tunnel)

    ref_out: np.ndarray | None = None
    rows = []
    for name, cfg in modes.items():
        if ref_out is not None and time.time() - T0 > budget_s:
            log(f"{name}: skipped (past FRONTIER_BUDGET_S)")
            rows.append({"mode": name, "skipped": "budget"})
            continue
        log(f"{name}: compile + first run")
        try:
            # bounded retry against transient tunnel errors (the BENCH_r04
            # loss mode) — one flake must not discard a mode's multi-minute
            # compile (bench._retry: backoff between attempts)
            from bench import _retry

            t0 = time.time()
            out = _retry(lambda: run_sync(cfg), label=name)
            compile_first = time.time() - t0
            times = []
            for _ in range(repeats):
                t0 = time.time()
                out = _retry(lambda: run_sync(cfg), label=name)
                times.append(time.time() - t0)
        except Exception as exc:  # record, keep sweeping
            log(f"{name}: FAILED {type(exc).__name__}: {exc}")
            rows.append(
                {"mode": name, "error": f"{type(exc).__name__}: {exc}"[:200]}
            )
            continue
        fps = batch / min(times)
        row = {
            "mode": name,
            "steps": cfg.steps,
            "frames_per_sec_per_chip": round(fps / jax.device_count(), 4),
            "compile_plus_first_s": round(compile_first, 1),
            "frame_times_s": [round(t, 3) for t in times],
            "anchor_mae_m": round(
                float(np.abs(out[valid] - sparse[valid]).mean()), 4
            ),
        }
        # only the full-parity mode may serve as the drift reference — a
        # filtered/failed full-50 must NOT silently promote a fast mode to
        # reference (the mae_vs_full keys would lie about their baseline)
        if name == "full-50" and ref_out is None:
            ref_out = out
            row["is_reference"] = True
        elif ref_out is not None:
            diff = out - ref_out
            row["mae_vs_full_m"] = round(float(np.abs(diff).mean()), 4)
            row["rmse_vs_full_m"] = round(float(np.sqrt((diff**2).mean())), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    ref_row = next((r for r in rows if r.get("is_reference")), None)
    print("\n| mode | steps | f/s/chip | speedup | MAE vs full (m) | RMSE vs full (m) | anchor MAE (m) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        if "frames_per_sec_per_chip" not in r:
            print(f"| {r['mode']} | — | {r.get('error', r.get('skipped'))} | | | | |")
            continue
        sp = (
            r["frames_per_sec_per_chip"] / ref_row["frames_per_sec_per_chip"]
            if ref_row
            else float("nan")
        )
        print(
            f"| {r['mode']} | {r['steps']} | {r['frames_per_sec_per_chip']} | "
            f"{sp:.2f}x | {r.get('mae_vs_full_m', '—')} | "
            f"{r.get('rmse_vs_full_m', '—')} | {r['anchor_mae_m']} |"
        )


if __name__ == "__main__":
    main()
