"""On-device A/B of the fused guidance epilogue vs the optax chain.

BENCH_r03 found the fused path ~8 ms/step SLOWER at full-program level; this
isolates the epilogue: chained-dispatch timing (tunnel overhead amortized)
of (a) the Pallas kernel path, (b) the XLA fallback math, (c) the optax
chain, at smoke latent geometry — plus a profiler trace of (a) to see what
Mosaic actually does with the single-grid-point kernel.

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_epilogue_tpu.py
"""

import glob
import gzip
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")
os.environ["DCT_EPILOGUE"] = "on"

import numpy as np
import jax
import jax.numpy as jnp
import optax

from depth_completion_tpu.ops import guidance_epilogue as ge
from depth_completion_tpu.sched.ddim import (
    ddim_step,
    make_schedule,
    pred_epsilon,
)

ITERS = 50
SHAPE = (1, 72, 96, 4)  # smoke-config latent


def chain(fn, *args):
    """Chained-dispatch timing: feed output back as input, sync once."""
    lat = args[0]
    out = fn(lat, *args[1:])
    lat = out[0] if isinstance(out, tuple) else out
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(lat, *args[1:])
        lat = out[0] if isinstance(out, tuple) else out
    s = float(jnp.sum(lat.astype(jnp.float32)))
    dt = (time.time() - t0) * 1e3 / ITERS
    return dt, s


def main():
    print("backend:", jax.default_backend(), flush=True)
    sched = make_schedule()
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    g = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    out = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    m = jnp.zeros(SHAPE, jnp.float32)
    v = jnp.zeros(SHAPE, jnp.float32)
    count = jnp.zeros((), jnp.int32)
    t = jnp.asarray(999)

    @jax.jit
    def fused(lat, g, out, m, v, count):
        return ge.guided_epilogue(lat, g, out, m, v, count, sched, t, 50, lr=0.05)

    @jax.jit
    def xla_fallback(lat, g, out, m, v, count):
        sc = ge._scalars(sched, t, t - 20, count, 0.9, 0.999, True)
        n, k = lat.shape[0], int(np.prod(SHAPE[1:]))
        fl = lambda x: x.reshape(n, k)
        nl, nm, nv = ge._epilogue_xla(
            fl(lat), fl(g), fl(out), fl(m), fl(v), sc,
            lr=0.05, b1=0.9, b2=0.999, adam_eps=1e-8, v_pred=True,
        )
        return nl.reshape(SHAPE), nm.reshape(SHAPE), nv.reshape(SHAPE), count + 1

    opt = optax.adam(0.05, b1=0.9, b2=0.999, eps=1e-8)

    @jax.jit
    def optax_chain(lat, g, out, opt_state):
        n = lat.shape[0]
        eps_ref = pred_epsilon(sched, out, t, lat)
        eps_norm = jnp.linalg.norm(eps_ref.reshape(n, -1), axis=1)
        g_norm = jnp.linalg.norm(g.reshape(n, -1), axis=1)
        factors = (eps_norm / jnp.maximum(g_norm, 1e-7)).reshape(n, 1, 1, 1)
        grads = {"latents": g * factors}
        updates, opt_state = opt.update(grads, opt_state, {"latents": lat})
        params = optax.apply_updates({"latents": lat}, updates)
        new_lat, _ = ddim_step(sched, out, t, params["latents"], 50)
        return new_lat, opt_state

    dt, _ = chain(fused, lat, g, out, m, v, count)
    print(f"fused pallas epilogue: {dt:.3f} ms/call", flush=True)
    os.environ["DCT_EPILOGUE"] = "off"
    dt, _ = chain(xla_fallback, lat, g, out, m, v, count)
    print(f"xla fallback epilogue: {dt:.3f} ms/call", flush=True)
    state = opt.init({"latents": lat})
    dt, _ = chain(optax_chain, lat, g, out, state)
    print(f"optax chain:           {dt:.3f} ms/call", flush=True)

    os.environ["DCT_EPILOGUE"] = "on"
    logdir = "/tmp/dct_epi_trace"
    with jax.profiler.trace(logdir):
        o = fused(lat, g, out, m, v, count)
        float(jnp.sum(o[0]))
        time.sleep(0.3)
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if paths:
        with gzip.open(paths[-1], "rt") as f:
            events = json.load(f)["traceEvents"]
        pid_names = {
            ev["pid"]: ev["args"].get("name", "")
            for ev in events
            if ev.get("ph") == "M" and ev.get("name") == "process_name"
        }
        rows = {}
        for ev in events:
            if ev.get("ph") != "X":
                continue
            if "TPU" not in pid_names.get(ev.get("pid"), ""):
                continue
            rows.setdefault(ev["name"], [0.0, 0])
            rows[ev["name"]][0] += ev.get("dur", 0) / 1e3
            rows[ev["name"]][1] += 1
        for name, (ms, cnt) in sorted(rows.items(), key=lambda kv: -kv[1][0])[:12]:
            print(f"  {ms:8.3f} ms x{cnt:3d}  {name[:100]}")


if __name__ == "__main__":
    main()
