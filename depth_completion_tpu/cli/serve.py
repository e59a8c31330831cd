"""Serving CLI: keep the model warm and answer completion requests.

A production-lifecycle counterpart to the batch `predict` CLI (the
reference ships only the latter, `/root/reference/predict.py`): load and
compile once, then serve a stream of requests at steady-state latency
with same-geometry micro-batching and per-session temporal latent carry.

    python -m depth_completion_tpu.cli.serve --model random --port 8571 \\
        --warmup 480x640

    curl -s -X POST --data-binary @frame.npz \\
        'http://127.0.0.1:8571/v1/complete?session=cam0' -o dense.npy

Model/options mirror `predict` (same defaults, same coercion rules,
reference predict.py:423-457); serving knobs are new. The sampler config
is fixed for the server's lifetime — every config field is part of the
XLA program cache key, so per-request config would recompile per request.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Any

import click

from depth_completion_tpu.cli.common import (
    coerce_guidance_options,
    init_bundle,
)
from depth_completion_tpu.cli.options import CommaSeparated
from depth_completion_tpu.logger import LOG_LEVELS, logger


def _parse_geometry(value: str) -> tuple[int, int]:
    try:
        h, w = value.lower().split("x")
        return int(h), int(w)
    except ValueError as exc:
        raise click.BadParameter(
            f"geometry must look like 480x640, got {value!r}"
        ) from exc


@click.command(help="Serve depth completion over HTTP with a warm model.")
@click.option("--model", type=click.Choice(["original", "lcm", "random"]),
              default="original", show_default=True,
              help="Marigold model family (see predict --help).")
@click.option("--checkpoint-dir", type=click.Path(path_type=Path), default=None,
              help="Local HF-layout checkpoint directory. Required unless "
              "--model=random.")
@click.option("--taesd-dir", type=click.Path(path_type=Path), default=None,
              help="Local TAESD checkpoint directory (for --vae=light).")
@click.option("--vae", type=click.Choice(["original", "light"]), default="light",
              show_default=True, help="VAE for decode.")
@click.option("-n", "--steps", type=click.IntRange(min=1), default=50,
              show_default=True, help="Denoising steps.")
@click.option("-r", "--res", type=click.IntRange(min=1), default=768,
              show_default=True, help="Processing resolution (longest side).")
@click.option("--norm", type=click.Choice(["const", "minmax", "percentile"]),
              default="const", show_default=True,
              help="Sparse-depth normalization method.")
@click.option("--percentile", type=CommaSeparated(float), default="0.01,0.99",
              show_default=True, help="Percentile range for --norm=percentile.")
@click.option("--max-depth", type=click.FloatRange(min=0, min_open=True),
              default=120.0, show_default=True,
              help="Max distance [m] of output dense depth maps (fixed for "
              "the server's lifetime; part of the compiled program).")
@click.option("--min-depth", type=click.FloatRange(min=0), default=0.0,
              show_default=True, help="Min distance [m].")
@click.option("-p", "--precision", type=click.Choice(["bf16", "fp32"]),
              default="bf16", show_default=True, help="Inference precision.")
@click.option("--loss-funcs", type=CommaSeparated(str), default="l1,l2",
              show_default=True, help="Guidance losses: l1, l2, edge, smooth.")
@click.option("--opt", type=click.Choice(["adam", "sgd", "adagrad"]),
              default="adam", show_default=True, help="Guidance optimizer.")
@click.option("--lr-latent", type=click.FloatRange(min=0, min_open=True),
              default=0.05, show_default=True, help="Latent learning rate.")
@click.option("--lr-scaling", type=click.FloatRange(min=0, min_open=True),
              default=0.005, show_default=True, help="Affine learning rate.")
@click.option("--closed-form", type=bool, default=False, show_default=True,
              help="Closed-form affine instead of learned.")
@click.option("--projection", type=click.Choice(["linear", "log", "log10"]),
              default="linear", show_default=True, help="Depth projection.")
@click.option("--inv", type=bool, default=False, show_default=True,
              help="Inverse (disparity) projection.")
@click.option("--train-latents", type=bool, default=True, show_default=True,
              help="Optimize latents during sampling.")
@click.option("--train-method", type=click.Choice(["per-step", "per-input"]),
              default="per-step", show_default=True, help="Training method.")
@click.option("--train-steps", type=click.IntRange(min=1), default=10,
              show_default=True, help="Steps for --train-method=per-input.")
@click.option("--beta",
              type=click.FloatRange(min=0, max=1, min_open=True, max_open=True),
              default=0.9, show_default=True,
              help="Temporal blend weight for session latent carry, in (0,1).")
@click.option("--fast-guidance", type=bool, default=False, show_default=True,
              help="Skip the UNet backward in guidance (~2x faster, "
              "non-parity gradients; see predict --help).")
@click.option("--host", type=str, default="127.0.0.1", show_default=True,
              help="Bind address. Use 0.0.0.0 only behind a trusted network.")
@click.option("--port", type=click.IntRange(min=0), default=8571,
              show_default=True, help="Bind port (0 picks a free port).")
@click.option("--max-batch", type=click.IntRange(min=1), default=4,
              show_default=True,
              help="Micro-batch size (also the largest static batch bucket; "
              "batch amortization measured +12% at batch 8, PERF.md "
              "round-3).")
@click.option("--batch-buckets", type=CommaSeparated(int), default=None,
              help="Static padded batch sizes, e.g. 1,4,8 — one compiled "
              "program each per geometry; a coalesced batch runs the "
              "smallest bucket that fits. Default: 1,<max-batch>.")
@click.option("--max-delay-ms", type=click.FloatRange(min=0), default=25.0,
              show_default=True,
              help="How long to wait for same-geometry batchmates.")
@click.option("--session-ttl", type=click.FloatRange(min=0, min_open=True),
              default=300.0, show_default=True,
              help="Idle seconds before a session's carry latent is dropped.")
@click.option("--max-queue", type=click.IntRange(min=1), default=256,
              show_default=True,
              help="Pending-request admission limit; beyond it requests are "
              "shed with HTTP 503 (each queued request is ~seconds of "
              "device time).")
@click.option("--warmup", type=CommaSeparated(str), default=None,
              help="Comma-separated HxW geometries to compile before "
              "accepting traffic, e.g. 480x640,352x1216.")
@click.option("--warmup-parallel", type=click.IntRange(min=1), default=1,
              show_default=True,
              help="Compile up to this many warmup programs concurrently "
              "(XLA compilation releases the GIL, so distinct programs "
              "overlap on host cores; executions still serialize on the "
              "device). Keep <= --max-programs when that bound is set.")
@click.option("--warmup-tiered/--no-warmup-tiered", default=False,
              show_default=True,
              help="Serve first, optimize later: compile fast low-effort "
              "tier-0 programs (~5x faster cold start at ~1.9x slower "
              "steps, measured on v5e), open for traffic, then recompile "
              "each signature at full effort in the background and swap "
              "dispatch as it lands. Steady-state throughput unchanged.")
@click.option("--tier-effort", type=click.FloatRange(min=-1.0, max=0.0),
              default=-1.0, show_default=True,
              help="XLA exec_time_optimization_effort for tier-0 programs "
              "(-1.0 = fastest compile; see PERF.md round-4 sweep).")
@click.option("--max-programs", type=click.IntRange(min=1), default=None,
              help="Bound the number of live compiled (geometry, bucket) "
              "programs; least-recently-used programs are evicted to free "
              "their device memory. Default: unbounded (batch-job "
              "behavior). Size it to >= geometries x (buckets+1) you want "
              "permanently warm.")
@click.option("--log", type=click.Path(path_type=Path), default=None,
              show_default=True, help="Path to save logs.")
@click.option("--log-level", type=click.Choice(LOG_LEVELS), default="INFO",
              show_default=True, help="Minimum log level.")
def main(**kw: Any) -> None:
    run_serve(**kw)


def run_serve(
    model: str,
    checkpoint_dir: Path | None,
    taesd_dir: Path | None,
    vae: str,
    steps: int,
    res: int,
    norm: str,
    percentile: list[float],
    max_depth: float,
    min_depth: float,
    precision: str,
    loss_funcs: list[str],
    opt: str,
    lr_latent: float,
    lr_scaling: float,
    closed_form: bool,
    projection: str,
    inv: bool,
    train_latents: bool,
    train_method: str,
    train_steps: int,
    beta: float,
    fast_guidance: bool,
    host: str,
    port: int,
    max_batch: int,
    batch_buckets: list[int] | None,
    max_delay_ms: float,
    session_ttl: float,
    max_queue: int,
    warmup: list[str] | None,
    max_programs: int | None,
    log: Path | None,
    log_level: str,
    warmup_parallel: int = 1,
    warmup_tiered: bool = False,
    tier_effort: float = -1.0,
    *,
    serve_forever: bool = True,
):
    """Build the engine + HTTP server. Returns (engine, httpd) when
    serve_forever=False (used by tests); otherwise blocks."""
    from depth_completion_tpu.core.compile_cache import enable_compile_cache
    from depth_completion_tpu.core.platform import respect_jax_platforms_env

    respect_jax_platforms_env()

    enable_compile_cache()
    logger.configure(level=log_level, log_path=log)

    # --- option coercions (shared with predict, reference predict.py:423-457)
    loss_funcs, norm, train_latents, closed_form = coerce_guidance_options(
        loss_funcs, norm, projection, inv, model, train_latents, closed_form
    )
    if not loss_funcs:
        # predict lets the sampler raise per run; a server with no valid
        # losses would reject every request forever — fail at startup.
        logger.critical("No valid loss functions specified")
        sys.exit(1)

    import jax

    from depth_completion_tpu.pipeline import DepthCompletionPipeline

    bundle = init_bundle(model, checkpoint_dir, taesd_dir, vae, precision)
    pipe = DepthCompletionPipeline(bundle, max_programs=max_programs)
    logger.info(f"Devices: {jax.devices()}")

    from depth_completion_tpu.serving.engine import ServingEngine
    from depth_completion_tpu.serving.server import make_server

    call_kwargs: dict[str, Any] = dict(
        max_depth=max_depth,
        min_depth=min_depth,
        steps=steps,
        resolution=res,
        norm=norm,
        percentile=tuple(percentile),
        loss_funcs=tuple(loss_funcs),
        opt=opt,
        lr_latent=lr_latent,
        lr_scaling=lr_scaling,
        closed_form=closed_form,
        projection=projection,
        inv=inv,
        train_latents=train_latents,
        train_method=train_method,
        train_steps=train_steps,
        scheduler="lcm" if model == "lcm" else "ddim",
        detach_unet_grad=fast_guidance,
    )
    engine = ServingEngine(
        pipe,
        call_kwargs,
        max_batch=max_batch,
        max_delay_ms=max_delay_ms,
        session_ttl_s=session_ttl,
        beta=beta,
        max_queue=max_queue,
        batch_buckets=tuple(batch_buckets) if batch_buckets else None,
    )

    if warmup:
        geoms = [_parse_geometry(g) for g in warmup]
        logger.info(
            f"Warming up {len(geoms)} geometries: {geoms} "
            f"(parallel={warmup_parallel}, tiered={warmup_tiered})"
        )
        engine.warmup(
            geoms,
            parallel=warmup_parallel,
            tiered=warmup_tiered,
            tier_effort=tier_effort,
        )
        logger.success(
            "Warmup complete"
            + (" (tier-0; full programs promoting in background)"
               if warmup_tiered else "")
        )

    httpd = make_server(engine, host=host, port=port)
    bound = httpd.server_address
    logger.success(f"Serving on http://{bound[0]}:{bound[1]}")
    if not serve_forever:
        return engine, httpd
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        logger.info("Shutting down")
    finally:
        httpd.shutdown()
        engine.shutdown()
    return None


if __name__ == "__main__":
    main()
