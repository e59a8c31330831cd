"""Benchmark: guided depth-completion throughput on the current accelerator.

Measures the BASELINE.md smoke config — one 640×480 RGB frame + ~500-point
sparse depth, 50-step DDIM with per-step latent guidance (learned affine,
l1+l2 anchor losses), TAESD decode path, bf16 — and prints ONE JSON line:

    {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
     "vs_baseline": R, ...}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is the
ratio to REFERENCE_FRAMES_PER_SEC, a *provisional estimate* of the reference
pipeline's single-GPU throughput at the same config (3 s/frame class; the
reference cannot run here — CUDA-only. Replace when a measured number lands
in BASELINE.md). Every quoted vs_baseline carries that asterisk.

Provenance fields (so a cold reader can interpret the capture, VERDICT r2):
``git_commit``, ``conv3x3_kernel`` (fused Pallas conv engaged?),
``fwd_streams``/``bwd_streams`` (flash kernel body config),
``compile_cache`` (hit/miss inferred from new cache-dir entries),
``compile_plus_first_s`` (first call: compile/deserialize + one full run),
``frame_times_s`` (whole-program wall time per frame — NOT per DDIM step),
``device_step_ms`` (profiler-trace device time per DDIM step, when the
trace tooling is available; wall clock over the remote tunnel includes
host↔device sync overhead that the trace excludes).

Env knobs: BENCH_STEPS (default 50), BENCH_BATCH (default 8 — the batch
amortizes per-step fixed overhead and fits v5e HBM without remat;
round-4 record 0.5079 f/s/chip at batch 8 / 0.4479 at batch 1 with the
transposed fused backward now default, see PERF.md round-4; the
round-3 batch/remat sweep is the batch-size story),
BENCH_REPEATS (default 3), BENCH_RES (default 768),
BENCH_RETRIES (default 3) / BENCH_RETRY_BACKOFF_S (default 20) — bounded
retry of device-touching phases against transient tunnel errors (the
BENCH_r04 capture was lost to ONE un-retried FailedPrecondition; on total
failure the JSON line still prints, carrying an "error" field), BENCH_FAST=1
(fast-guidance mode: skip the UNet backward — NOT the parity config; the
headline stays full-parity gradients), BENCH_TRACE=0 (skip the profiler
pass), BENCH_SOL=0 (skip the speed-of-light component measurement),
BENCH_PEAK_TFLOPS (peak bf16 override for unlisted chips).

Hardware-grounded metrics (VERDICT r3 #2 — the 0.33 f/s reference figure is
an assumption, so perf is also judged against the chip itself):
``mfu_pct`` (XLA cost-analysis FLOPs / device step time / peak bf16);
``sol_pct`` + ``sol_roofline_ms``/``sol_breakdown_ms`` (per-op roofline
floor computed from the profiler trace of the REAL program — each device
event's max(flops/peak, bytes/HBM-BW), flash-attention events floored by
their exact analytic matmul flops; see _trace_metrics. Trace-based so it
lands every round: the standalone-program variant below was lost twice to
pathological tunnel compiles); ``sol_components_ms`` +
``sol_composition_pct`` (BENCH_SOL=1 only: isolated UNet fwd/fwd+bwd and
decode fwd+bwd programs at the bench geometry — the composition floor).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

REFERENCE_FRAMES_PER_SEC = 0.33  # provisional; see BASELINE.md

# Peak dense bf16 matmul throughput per chip (public TPU specs), keyed by
# substrings of jax Device.device_kind. Used for the hardware-grounded MFU
# metric (VERDICT r3 #2): perf is judged against the chip, not the assumed
# reference constant. Override with BENCH_PEAK_TFLOPS for unlisted chips.
_PEAK_BF16_TFLOPS = (
    ("v6 lite", 918.0), ("v6e", 918.0),
    ("v5p", 459.0),
    ("v5 lite", 197.0), ("v5e", 197.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 46.0),
)

# Peak HBM bandwidth per chip (public TPU specs), GB/s — the bandwidth leg
# of the per-op roofline SOL. Override with BENCH_PEAK_HBM_GBPS.
_PEAK_HBM_GBPS = (
    ("v6 lite", 1640.0), ("v6e", 1640.0),
    ("v5p", 2765.0),
    ("v5 lite", 819.0), ("v5e", 819.0),
    ("v4", 1228.0),
    ("v3", 900.0),
    ("v2", 700.0),
)


def _peak_tflops(device_kind: str) -> float | None:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    kind = device_kind.lower()
    for sub, peak in _PEAK_BF16_TFLOPS:
        if sub in kind:
            return peak
    return None


def _peak_hbm_gbps(device_kind: str) -> float | None:
    env = os.environ.get("BENCH_PEAK_HBM_GBPS")
    if env:
        return float(env)
    kind = device_kind.lower()
    for sub, peak in _PEAK_HBM_GBPS:
        if sub in kind:
            return peak
    return None


def _program_flops(compiled) -> float | None:
    """FLOPs of a compiled program per XLA's cost analysis.

    Two accounting caveats that shape how callers use this number
    (verified on both CPU and the TPU tunnel, round 4):
    - a `lax.scan`/while body is counted ONCE, not x trip-count — so for
      the sampler (one scan over DDIM steps) this is ~the per-STEP flops
      (plus the prep/final decode, a few percent), NOT the whole run;
    - custom-call kernels (Pallas flash attention) report ZERO flops —
      their matmul work must be added back analytically
      (_attention_fwd_flops) when the flash path is engaged.
    """
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _attention_fwd_flops(bundle, images_d, cfg) -> float | None:
    """Matmul FLOPs (2/MAC) of ONE UNet forward's attention score/value
    contractions that take the PALLAS path, counted exactly by
    abstract-tracing apply_unet with a shape-recording attention_fn (no
    device work). QK is 2*N*S*Sk*C and PV the same (heads partition C:
    heads*S*Sk*d = S*Sk*C). The projection linears around attention are
    ordinary HLO dots and already counted by XLA; and call sites where
    flash_attention falls back to XLA attention (short sequences — the
    2-token cross-attention context and low-res self-attention stages —
    or non-tileable head dims) are ALSO already in XLA's cost analysis,
    so counting them here would double-count (ADVICE r4). Only the
    Pallas-hidden score/value contractions are returned; the fallback
    predicate mirrors ops/flash_attention.py:877-881 exactly."""
    import inspect

    import jax
    import jax.numpy as jnp

    from depth_completion_tpu.models.unet import apply_unet
    from depth_completion_tpu.ops import flash_attention as fa_mod
    from depth_completion_tpu.ops.resize import latent_size

    try:
        min_seq_len = (
            inspect.signature(fa_mod.flash_attention)
            .parameters["min_seq_len"].default
        )
        h, w = int(images_d.shape[1]), int(images_d.shape[2])
        eh, ew = latent_size(
            (h, w), cfg.resolution, bundle.vae.downsample_factor
        )
        n = int(images_d.shape[0])
        counts: list[float] = []

        def counting_attn(q, k, v, num_heads):
            nq, s, c = q.shape
            sk = k.shape[1]
            d = c // num_heads if c % num_heads == 0 else 0
            takes_pallas = (
                sk >= min_seq_len
                and c % num_heads == 0
                and (d % 128 == 0 or d == 64)
            )
            if takes_pallas:
                counts.append(4.0 * nq * s * sk * c)  # QK + PV, 2 FLOPs/MAC
            return q  # attention output has q's shape

        x = jax.ShapeDtypeStruct((n, eh, ew, 8), bundle.text_context.dtype)
        t = jax.ShapeDtypeStruct((), jnp.int32)
        ctx = jax.ShapeDtypeStruct(
            (n,) + tuple(bundle.text_context.shape[1:]),
            bundle.text_context.dtype,
        )
        jax.eval_shape(
            lambda x_, t_, c_: apply_unet(
                bundle.unet_params, x_, t_, c_, bundle.unet_config,
                attention_fn=counting_attn,
            ),
            x, t, ctx,
        )
        return sum(counts)
    except Exception:
        return None


def _conv_call_costs(
    x_shape: tuple, co: int, itemsize: int, has_skip: bool
) -> tuple[float, float]:
    """(FLOPs, HBM bytes) of one fused-conv3x3 call AS EXECUTED: the
    decoder's W-packed formulation (vae_tiny.py:100-131) runs a dense
    [3,3,2c,2c] conv on the packed input, so executed MACs are 2x the
    logical conv's — the roofline floors the op as formulated, matching
    how XLA's model_flops counts executed fusion work."""
    n, h, w, ci = x_shape
    flops = 2.0 * n * h * w * 9 * ci * co
    plane = n * h * w * itemsize
    nbytes = plane * (ci + co + (co if has_skip else 0))
    return flops, nbytes


def _conv3x3_fwd_costs(bundle, images_d, cfg) -> tuple[float, float] | None:
    """(matmul FLOPs, HBM bytes) of ONE decode-path forward's fused-conv3x3
    Pallas calls, recorded exactly by abstract-tracing ``latent_to_affine``
    with a cost-recording stand-in (no device work). Used to floor the
    conv3x3 custom-call trace events analytically in the roofline SOL —
    those kernels report zero flops/bytes to XLA, and using their measured
    time as their own floor (the round-5 first cut) assumed they were
    already optimal. The guided step runs the decode forward plus its dx
    conv (same cost class: ``_conv_fused_bwd`` reuses the kernel on the
    flipped filter, conv3x3.py:211-219), so callers double this for a
    per-step floor; dk/db are plain XLA forms already in cost analysis.
    """
    import jax
    import jax.numpy as jnp

    from depth_completion_tpu.ops import conv3x3 as c3
    from depth_completion_tpu.ops.resize import latent_size
    from depth_completion_tpu.pipeline.sampler import latent_to_affine

    try:
        h, w = int(images_d.shape[1]), int(images_d.shape[2])
        m = max(h, w)
        new_h, new_w = cfg.resolution * h // m, cfg.resolution * w // m
        padding = (-new_h % 16, -new_w % 16)
        eh, ew = latent_size((h, w), cfg.resolution, bundle.vae.downsample_factor)
        n = int(images_d.shape[0])
        ch = getattr(bundle.vae.config, "latent_channels", 4)

        costs = [0.0, 0.0]
        real = c3.conv3x3_fused

        def recording(x, kernel, bias=None, *, relu=False, skip=None):
            co = kernel.shape[-1]
            fl, by = _conv_call_costs(
                tuple(x.shape), co, jnp.dtype(x.dtype).itemsize,
                skip is not None,
            )
            costs[0] += fl
            costs[1] += by
            return jnp.zeros(tuple(x.shape[:3]) + (co,), x.dtype)

        prev_env = os.environ.get("DCT_CONV_KERNEL")
        os.environ["DCT_CONV_KERNEL"] = "on"  # engage the gate while tracing
        c3.conv3x3_fused = recording
        try:
            lat = jax.ShapeDtypeStruct((n, eh, ew, ch), jnp.float32)
            jax.eval_shape(
                lambda z: latent_to_affine(
                    bundle, z, (h, w), padding, cfg.interp_mode
                ),
                lat,
            )
        finally:
            c3.conv3x3_fused = real
            if prev_env is None:
                os.environ.pop("DCT_CONV_KERNEL", None)
            else:
                os.environ["DCT_CONV_KERNEL"] = prev_env
        return (costs[0], costs[1]) if costs[0] > 0 else None
    except Exception:
        return None


def _chained_ms_per_call(fn, x, *args, calls: int = 8) -> float:
    """Wall time per call with output→input chaining (amortizes the remote
    tunnel's per-sync overhead; trustworthy above ~5 ms/call, PERF.md)."""
    import jax.numpy as jnp

    y = fn(x, *args)
    float(jnp.sum(y))  # warm + sync
    t0 = time.time()
    for _ in range(calls):
        x = fn(x, *args)
    float(jnp.sum(x))
    return (time.time() - t0) / calls * 1e3


def _sol_components(bundle, images_d, sparse_d, cfg, deadline_s: float | None = None) -> dict | None:
    """Measured per-step SOL decomposition at the bench geometry.

    The parity step's irreducible device work is one UNet forward+backward
    plus one decode-head forward+backward (gradients flow through both:
    reference marigold_dc.py:806-877); everything else (scheduler algebra,
    optimizer, rescale) is bandwidth-trivial on the ~110 KB/frame latent.
    Each component is timed as its own jitted program at the exact bench
    geometry/batch — the sum is the speed-of-light budget for the step, and
    sol_pct says how close the fused full program gets to it.
    """
    import jax
    import jax.numpy as jnp

    from depth_completion_tpu.models.unet import apply_unet
    from depth_completion_tpu.ops.flash_attention import flash_attention
    from depth_completion_tpu.pipeline.sampler import _prepare, latent_to_affine

    comp: dict = {}

    def over_budget() -> bool:
        return deadline_s is not None and time.time() - _T0 > deadline_s

    try:
        # static geometry on the host (an eager _prepare would dispatch
        # hundreds of small ops one-by-one over the remote tunnel)
        h, w = int(images_d.shape[1]), int(images_d.shape[2])
        m = max(h, w)
        new_h, new_w = cfg.resolution * h // m, cfg.resolution * w // m
        padding = (-new_h % 16, -new_w % 16)
        orig_res = (h, w)

        if over_budget():
            comp["skipped"] = "deadline before prep compile"
            return comp

        @jax.jit
        def _prep(images, sparses):
            out = _prepare(
                bundle, images, sparses, cfg, None, jax.random.PRNGKey(0)
            )
            return out[0], out[1]

        # the prep program is its own cold compile on an uncached worker
        # (measured 1320 s once, round 4) — it must respect the budget too
        img_latents, pred_latents = _prep(images_d, sparse_d)
        comp["prep_s"] = round(time.time() - _T0, 1)
        n = img_latents.shape[0]
        ctx = jnp.broadcast_to(
            bundle.text_context, (n,) + bundle.text_context.shape[1:]
        )
        t = jnp.asarray(999)

        def unet_eps(lat):
            x = jnp.concatenate(
                [img_latents, lat.astype(img_latents.dtype)], axis=-1
            )
            return apply_unet(
                bundle.unet_params, x, t, ctx, bundle.unet_config,
                attention_fn=flash_attention, remat=False,
            ).astype(jnp.float32)

        unet_fwd = jax.jit(unet_eps)
        unet_fwd_bwd = jax.jit(
            jax.grad(lambda lat: jnp.sum(unet_eps(lat)))
        )
        decode_fwd_bwd = jax.jit(
            jax.grad(
                lambda lat: jnp.sum(
                    latent_to_affine(
                        bundle, lat, orig_res, padding, cfg.interp_mode
                    )
                )
            )
        )
        lat0 = pred_latents.astype(jnp.float32)

        # deadline-aware: each component is a fresh cold compile on an
        # uncached worker (minutes over a tunnel); skip what no longer
        # fits so the bench's one JSON line always lands. Essential
        # components (the SOL sum) first, the diagnostic fwd-only last.
        def timed(name, fn):
            if over_budget():
                comp[name] = None  # skipped: out of budget
                return
            try:
                comp[name] = round(_chained_ms_per_call(fn, lat0), 2)
            except Exception as exc:  # e.g. standalone-program OOM
                comp[name] = f"error: {type(exc).__name__}: {exc}"[:160]

        timed("unet_fwd_bwd_ms", unet_fwd_bwd)
        timed("decode_fwd_bwd_ms", decode_fwd_bwd)
        timed("unet_fwd_ms", unet_fwd)
        if isinstance(comp.get("unet_fwd_bwd_ms"), float) and isinstance(
            comp.get("decode_fwd_bwd_ms"), float
        ):
            comp["sol_step_ms"] = round(
                comp["unet_fwd_bwd_ms"] + comp["decode_fwd_bwd_ms"], 2
            )
        return comp
    except Exception as exc:
        # never drop the whole dict silently: the JSON line should say WHY
        # components are missing (this used to return None, hiding a
        # prep-compile overrun behind an absent key)
        comp["error"] = f"{type(exc).__name__}: {exc}"[:300]
        return comp


def _phase(msg: str) -> None:
    """Progress timestamps on stderr (BENCH_VERBOSE=1); the JSON line on
    stdout stays the single machine-readable artifact."""
    if os.environ.get("BENCH_VERBOSE", "0") == "1":
        import sys

        print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr)


def _retry(fn, *, attempts: int | None = None, backoff_s: float | None = None,
           label: str = "run", on_retry=None):
    """Bounded retry for transient backend failures (BENCH_r04 post-mortem:
    the round-4 driver capture died on ONE transient tunnel
    `FailedPrecondition` at the first run_sync with no retry; an identical
    re-run on the same chip minutes later was clean — VERDICT r4 weak #1).
    Linear backoff between attempts; ``on_retry`` runs before each retry
    (callers re-``device_put`` inputs there, in case the failed dispatch
    poisoned the buffers). Raises the last error after the final attempt —
    the caller's job is to still emit the JSON artifact (see ``main``).
    """
    if attempts is None:
        attempts = int(os.environ.get("BENCH_RETRIES", "3"))
    if backoff_s is None:
        backoff_s = float(os.environ.get("BENCH_RETRY_BACKOFF_S", "20"))
    last: Exception | None = None
    for i in range(max(attempts, 1)):
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except Exception as exc:
            last = exc
            _phase(
                f"{label}: attempt {i + 1}/{attempts} failed: "
                f"{type(exc).__name__}: {exc}"
            )
            if i + 1 < attempts:
                time.sleep(backoff_s * (i + 1))
                if on_retry is not None:
                    try:
                        on_retry()
                    except Exception:
                        pass  # a failed refresh must not mask the real error
    assert last is not None
    raise last


_T0 = time.time()


def _git_commit() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _cache_entries() -> set[str]:
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    try:
        return set(os.listdir(d)) if d and os.path.isdir(d) else set()
    except OSError:
        return set()


def _trace_metrics(
    fn,
    args,
    steps: int,
    peak_tflops: float | None = None,
    hbm_gbps: float | None = None,
    attn_fwd_flops_step: float | None = None,
    attn_bwd_factor: float = 3.5,
    conv_costs: tuple[float, float] | None = None,
    conv_factor: float = 2.0,
) -> dict | None:
    """One traced run → device-time and roofline-SOL metrics, or None if the
    trace tooling is unavailable (e.g. no tensorboard profile plugin).

    ``device_step_ms``: the single longest device event is the jitted module
    execution — its span IS the device time for the whole traced frame
    (events nest module → fusion → sub-op, so summing overcounts).

    ``sol_pct`` (VERDICT r4 #2): per-op roofline floor over the achieved
    module span, computed FROM THE TRACE OF THE REAL PROGRAM — no standalone
    component programs, whose cold compiles died on the degraded tunnel
    twice (rounds 3-4). Every synchronous device event carries XLA's
    ``model_flops`` and ``raw_bytes_accessed``; its floor is
    max(flops/peak_flops, bytes/peak_bw). Pallas custom-calls report zero
    for both, so flash-attention events (source = ops/flash_attention.py)
    are floored analytically (the exact score/value matmul flops, bwd
    = ``attn_bwd_factor`` x fwd), fused-conv3x3 events by the recorded
    decode-path costs (``conv_costs`` from _conv3x3_fwd_costs; fwd + dx
    per step = ``conv_factor``), and any remaining opaque kernel at its
    measured time — conservative in the kernels' favor. Async
    copy bookkeeping (async-start/done, copy-start/done) is excluded: its
    bytes ride concurrently and are already charged to consuming fusions.
    """
    import gzip

    import jax
    import jax.numpy as jnp

    logdir = "/tmp/dct_bench_trace"
    try:
        with jax.profiler.trace(logdir):
            denses, _ = fn(*args)
            float(jnp.sum(denses))  # sync (block_until_ready no-ops on tunnel)
            time.sleep(0.3)
        paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
        if paths:
            with gzip.open(paths[-1], "rt") as f:
                events = json.load(f)["traceEvents"]
        else:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

            xplanes = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
            if not xplanes:
                return None
            data, _ = rtd.xspace_to_tool_data(xplanes[-1:], "trace_viewer", {})
            events = json.loads(data)["traceEvents"]
        return _analyze_trace_events(
            events, steps, peak_tflops, hbm_gbps,
            attn_fwd_flops_step, attn_bwd_factor,
            conv_costs, conv_factor,
        )
    except Exception:
        return None


def _analyze_trace_events(
    events: list,
    steps: int,
    peak_tflops: float | None,
    hbm_gbps: float | None,
    attn_fwd_flops_step: float | None,
    attn_bwd_factor: float,
    conv_costs: tuple[float, float] | None = None,
    conv_factor: float = 2.0,
) -> dict | None:
    """Pure analysis half of ``_trace_metrics`` (unit-testable offline)."""
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")

    def on_device(ev) -> bool:
        pname = pid_names.get(ev.get("pid"), "")
        return "TPU" in pname or "Chip" in pname

    longest_us = 0.0
    for ev in events:
        if ev.get("ph") == "X" and on_device(ev):
            longest_us = max(longest_us, ev.get("dur", 0))
    if longest_us <= 0:
        return None
    out: dict = {"device_step_ms": longest_us / 1e3 / steps}
    if peak_tflops is None or hbm_gbps is None:
        return out

    ASYNC = {"async-start", "async-done", "copy-start", "copy-done"}
    floor_s = 0.0
    attn_meas_s = 0.0
    conv_meas_s = 0.0
    opaque_s = 0.0
    cat_s: dict[str, float] = {}
    for ev in events:
        if ev.get("ph") != "X" or not on_device(ev):
            continue
        a = ev.get("args", {})
        cat = a.get("hlo_category")
        # category-less events are containers (the module span, queue
        # rows); "while" is the sampling scan's container event
        if cat is None or cat == "while":
            continue
        dur_s = int(a.get("device_duration_ps", ev.get("dur", 0) * 1e6)) / 1e12
        cat_s[cat] = cat_s.get(cat, 0.0) + dur_s
        if cat in ASYNC:
            continue
        flops = float(a.get("model_flops", 0))
        nbytes = float(a.get("raw_bytes_accessed", 0))
        if flops == 0 and nbytes == 0:
            src = a.get("source", "")
            if attn_fwd_flops_step is not None and "flash_attention" in src:
                attn_meas_s += dur_s  # floored analytically below
            elif conv_costs is not None and "conv3x3" in src:
                conv_meas_s += dur_s  # floored analytically below
            else:
                floor_s += dur_s  # opaque kernel: measured = floor
                opaque_s += dur_s
            continue
        floor_s += max(flops / (peak_tflops * 1e12), nbytes / (hbm_gbps * 1e9))
    if attn_fwd_flops_step is not None:
        floor_s += (
            attn_fwd_flops_step * attn_bwd_factor * steps
            / (peak_tflops * 1e12)
        )
    if conv_costs is not None:
        cf, cb = conv_costs
        floor_s += (
            max(cf / (peak_tflops * 1e12), cb / (hbm_gbps * 1e9))
            * conv_factor
            * steps
        )
    if floor_s <= 0:
        return out
    out["sol_roofline_ms"] = round(floor_s * 1e3 / steps, 2)
    out["sol_pct"] = round(
        floor_s * 1e3 / steps / out["device_step_ms"] * 100, 1
    )
    out["sol_attn_measured_ms"] = round(attn_meas_s * 1e3 / steps, 2)
    if conv_costs is not None:
        out["sol_conv_measured_ms"] = round(conv_meas_s * 1e3 / steps, 2)
    out["sol_opaque_kernel_ms"] = round(opaque_s * 1e3 / steps, 2)
    out["sol_breakdown_ms"] = {
        c: round(s * 1e3 / steps, 2)
        for c, s in sorted(cat_s.items(), key=lambda kv: -kv[1])[:8]
        if s * 1e3 / steps >= 0.05
    }
    return out


def _measure() -> dict:
    import jax
    import jax.numpy as jnp

    from depth_completion_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.ops import conv3x3
    from depth_completion_tpu.ops import flash_attention as fa
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    steps = int(os.environ.get("BENCH_STEPS", "50"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    res = int(os.environ.get("BENCH_RES", "768"))
    fast = os.environ.get("BENCH_FAST", "0") == "1"
    do_trace = os.environ.get("BENCH_TRACE", "1") == "1"

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
        # BENCH_REMAT=on|off overrides the auto threshold (auto flips
        # remat ON beyond batch·latent-area 12·72·96 — batch 12 at the
        # bench's 480×640 inputs; batch/remat sweep in PERF.md round-3)
        remat_unet=os.environ.get("BENCH_REMAT", "auto"),
    )
    fn = jax.jit(guided_sample, static_argnames=("cfg",))
    # SOL components: "auto" runs them only when the main program came out
    # of a warm compile cache (each component is its own minutes-long cold
    # compile on an uncached worker; the tunnel load-balances workers, so
    # a driver-run cold bench should stay bounded). 1/0 force on/off.
    sol_mode = os.environ.get("BENCH_SOL", "auto")

    # inputs live in a refreshable holder: on a transient backend error the
    # retry path re-device_puts them (a failed dispatch can leave buffers in
    # an undefined state on the tunnel backend)
    dev = {}

    def put_inputs():
        dev["images"] = jax.device_put(jnp.asarray(images))
        dev["sparse"] = jax.device_put(jnp.asarray(sparse))

    put_inputs()

    def run_sync():
        """Run and force completion. block_until_ready is a no-op on the
        remote-tunnel backend, so fetch a scalar to synchronize."""
        denses, _ = fn(bundle, dev["images"], dev["sparse"], cfg)
        return float(jnp.sum(denses))

    cache_before = _cache_entries()
    _phase("first run (compile)")
    t0 = time.time()
    checksum = _retry(run_sync, label="first run", on_retry=put_inputs)
    compile_and_first = time.time() - t0
    cache_state = "miss" if _cache_entries() - cache_before else "hit"

    _phase("cost analysis (lower+compile, cache-hit expected)")
    try:
        program_flops = _retry(
            lambda: _program_flops(
                fn.lower(bundle, dev["images"], dev["sparse"], cfg).compile()
            ),
            attempts=2, label="cost analysis",
        )
    except Exception:
        program_flops = None  # MFU is a bonus metric; never kill the bench
    _phase("timed repeats")

    times = []
    for _ in range(repeats):
        def timed_once():
            t0 = time.time()
            run_sync()
            return time.time() - t0

        # a retried repeat is timed from its own (clean) attempt only
        times.append(
            _retry(timed_once, label="timed repeat", on_retry=put_inputs)
        )
    del checksum

    # analytic Pallas-path attention flops, shared by the MFU add-back and
    # the trace roofline's flash-kernel floor (None when flash is off or
    # the recorder fails -> flash events fall back to measured-as-floor)
    flash_on = cfg.flash_attention == "on" or (
        cfg.flash_attention == "auto" and jax.default_backend() == "tpu"
    )
    attn_fwd = (
        _attention_fwd_flops(bundle, dev["images"], cfg) if flash_on else None
    )
    # analytic decode-conv costs for the same roofline (the fused conv3x3
    # kernel engages whenever the bench runs on TPU)
    conv_costs = (
        _conv3x3_fwd_costs(bundle, dev["images"], cfg)
        if jax.default_backend() == "tpu"
        else None
    )

    _phase("profiler trace")
    peak = _peak_tflops(jax.devices()[0].device_kind)
    hbm = _peak_hbm_gbps(jax.devices()[0].device_kind)
    trace = (
        _trace_metrics(
            fn, (bundle, dev["images"], dev["sparse"], cfg), steps,
            peak_tflops=peak, hbm_gbps=hbm,
            attn_fwd_flops_step=attn_fwd,
            attn_bwd_factor=1.0 if fast else 3.5,
            # decode fwd + its dx conv per step (fast mode still
            # differentiates through the decoder)
            conv_costs=conv_costs,
            conv_factor=2.0,
        )
        if do_trace
        else None
    )
    device_step_ms = trace.get("device_step_ms") if trace else None
    # standalone composition-floor components: explicit opt-in only — their
    # cold compiles died on the degraded tunnel in rounds 3-4; the trace
    # roofline above is the always-available SOL (VERDICT r4 #2)
    do_sol = jax.default_backend() == "tpu" and sol_mode == "1"
    _phase("SOL components" if do_sol else "standalone SOL skipped")
    sol = (
        _sol_components(
            bundle, dev["images"], dev["sparse"], cfg,
            deadline_s=float(os.environ.get("BENCH_SOL_BUDGET_S", "1500")),
        )
        if do_sol
        else None
    )
    _phase("done")

    best = min(times)
    fps = batch / best
    n_chips = jax.device_count()
    fps_per_chip = fps / max(n_chips, 1)
    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps_per_chip, 4),
        "unit": "frames/s",
        # vs an ASSUMED 0.33 f/s reference figure (BASELINE.md) — the
        # reference itself cannot run in this CUDA-less environment.
        "vs_baseline": round(fps_per_chip / REFERENCE_FRAMES_PER_SEC, 3),
        "baseline_provisional": True,
        "config": f"{steps}-step DDIM guided, res {res}, batch {batch}, bf16, "
        f"taesd{', fast-guidance' if fast else ''}",
        "backend": jax.default_backend(),
        "devices": n_chips,
        "git_commit": _git_commit(),
        "conv3x3_kernel": conv3x3.enabled(),
        "fwd_streams": fa.FWD_STREAMS,
        "bwd_streams": fa.BWD_STREAMS,
        "compile_cache": cache_state,
        # first call = compile (or cache deserialize) + one full run
        "compile_plus_first_s": round(compile_and_first, 1),
        # whole-program wall time per FRAME (50 DDIM steps each), incl.
        # tunnel sync — not per-step times
        "frame_times_s": [round(t, 3) for t in times],
    }
    if device_step_ms is not None:
        # device-event time per DDIM step from a profiler trace (excludes
        # host/tunnel overhead; the honest per-step device cost)
        result["device_step_ms"] = round(device_step_ms, 2)

    # Hardware-grounded metrics (VERDICT r3 #2): judge perf against the
    # chip, not the assumed reference constant. Uses the trace-measured
    # device time when available, else wall time (includes tunnel sync).
    step_s = (
        device_step_ms / 1e3 if device_step_ms is not None else best / steps
    )
    result["device_kind"] = jax.devices()[0].device_kind
    if trace:
        # roofline SOL from the traced program (see _trace_metrics): the
        # per-op compute/bandwidth floor over the achieved device span
        for k in (
            "sol_pct", "sol_roofline_ms", "sol_attn_measured_ms",
            "sol_conv_measured_ms", "sol_opaque_kernel_ms",
            "sol_breakdown_ms",
        ):
            if k in trace:
                result[k] = trace[k]
    if program_flops is not None:
        # XLA's cost analysis counts the sampling scan's body ONCE (verified
        # round 4 on CPU and the tunnel), so program_flops ~= per-step flops
        # (+ prep/final decode, a few %) — no division by steps. Pallas
        # flash kernels report zero flops; add their score/value matmuls
        # back analytically. Backward factor: the fused flash bwd recomputes
        # the score matrix and emits dq/dk/dv — 5 matmuls vs the forward's
        # 2, so fwd+bwd = 3.5x the forward's attention flops (fast-guidance
        # skips the UNet backward entirely -> factor 1).
        step_flops = program_flops
        # attn_fwd/flash_on computed above (pre-trace): mirror the
        # sampler's own engagement condition (pipeline/sampler.py:348-353)
        if flash_on and attn_fwd is not None:
            step_flops += attn_fwd * (1.0 if fast else 3.5)
            result["attn_flops_per_step"] = round(attn_fwd / 1e9, 1)  # GF
        result["flops_per_step"] = round(step_flops / 1e9, 1)  # GF
        if peak is not None and step_s > 0:
            result["peak_bf16_tflops"] = peak
            result["mfu_pct"] = round(
                step_flops / step_s / (peak * 1e12) * 100, 1
            )
    if sol is not None:
        # measured speed-of-light budget: isolated UNet fwd+bwd + decode
        # fwd+bwd programs at the bench geometry (see _sol_components)
        result["sol_components_ms"] = sol
        if step_s > 0 and sol.get("sol_step_ms"):
            # composition floor: isolated-program sum over the fused step
            # (distinct from the trace-roofline sol_pct above)
            result["sol_composition_pct"] = round(
                sol["sol_step_ms"] / (step_s * 1e3) * 100, 1
            )
    return result


def main() -> None:
    """Print exactly ONE JSON line on stdout, no matter what.

    If every retry inside ``_measure`` is exhausted (e.g. the TPU tunnel is
    down for the whole window), the line carries ``value: 0`` and an
    ``error`` field instead of being an opaque traceback — the scoreboard
    artifact must never be lost to an infrastructure failure (VERDICT r4
    weak #1 / next #1).
    """
    try:
        result = _measure()
    except KeyboardInterrupt:
        raise
    except BaseException as exc:  # incl. SystemExit from backend init
        result = {
            "metric": "frames_per_sec_per_chip",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "baseline_provisional": True,
            "error": f"{type(exc).__name__}: {exc}"[:500],
            "retries": int(os.environ.get("BENCH_RETRIES", "3")),
            "git_commit": _git_commit(),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
