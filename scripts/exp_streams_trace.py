"""Trace-based A/B of FWD_STREAMS/BWD_STREAMS on the production flash kernels.

Chained-dispatch timing over the tunnel is unreliable below ~5 ms/call
(PERF.md); this harness times the actual Pallas kernel device events from a
jax.profiler trace instead, at UNet stage-0 geometry (S=72*96, 5 heads,
d=64), for each (FWD_STREAMS, BWD_STREAMS) setting.

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_streams_trace.py
"""

import glob
import gzip
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

import jax
import jax.numpy as jnp

from depth_completion_tpu.ops import flash_attention as fa

ITERS = 8


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def device_kernel_ms(logdir):
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        xplanes = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
        data, _ = rtd.xspace_to_tool_data(xplanes[-1:], "trace_viewer", {})
        events = json.loads(data)["traceEvents"]
    else:
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
    return by_name


def run_case(tag, fwd_streams, bwd_streams):
    fa.FWD_STREAMS = fwd_streams
    fa.BWD_STREAMS = bwd_streams
    s, heads, c = 72 * 96, 5, 320
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, s, c), jnp.bfloat16)

    fwd = jax.jit(lambda q: fa.flash_attention(q, q, q, heads))
    vg = jax.jit(
        jax.grad(
            lambda q: jnp.sum(fa.flash_attention(q, q, q, heads).astype(jnp.float32))
        )
    )
    ref = sync(fwd(q))
    gref = sync(vg(q))

    logdir = f"/tmp/dct_streams_{tag}"
    with jax.profiler.trace(logdir):
        o = None
        for _ in range(ITERS):
            o = fwd(q)
        sync(o)
        for _ in range(ITERS):
            o = vg(q)
        sync(o)
        time.sleep(0.3)

    by_name = device_kernel_ms(logdir)
    total_fwd = total_bwd = 0.0
    n_fwd = n_bwd = 0
    for name, (ms, cnt) in by_name.items():
        low = name.lower()
        # Match only the Pallas kernel events by their kernel-function names
        # (bare "custom-call" events are ambiguous — excluded from totals).
        if "fwd_kernel" in low:
            total_fwd += ms
            n_fwd += cnt
        elif "bwd" in low or "dkv" in low or "dq_kernel" in low:
            total_bwd += ms
            n_bwd += cnt
    print(f"[{tag}] fwd_streams={fwd_streams} bwd_streams={bwd_streams}")
    for name, (ms, cnt) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:8]:
        print(f"    {ms:9.3f} ms total x{cnt:3d}  {name[:100]}")
    # fwd kernel events appear 2*ITERS times (fwd alone + fwd of the vjp)
    print(
        f"    totals: fwd {total_fwd:.3f} ms / {n_fwd} events "
        f"({total_fwd / max(n_fwd, 1):.3f} ms/event), "
        f"bwd {total_bwd:.3f} ms / {n_bwd} events "
        f"({total_bwd / max(n_bwd, 1):.3f} ms/event)"
    )
    return ref, gref


def main():
    print("backend:", jax.default_backend(), flush=True)
    r11, g11 = run_case("f1b1", 1, 1)
    r21, g21 = run_case("f2b1", 2, 1)
    r12, g12 = run_case("f1b2", 1, 2)
    r22, g22 = run_case("f2b2", 2, 2)
    print("fwd checksum deltas vs f1b1:", r21 - r11, r12 - r11, r22 - r11)
    print("bwd checksum deltas vs f1b1:", g21 - g11, g12 - g11, g22 - g11)


if __name__ == "__main__":
    main()
