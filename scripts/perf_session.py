"""One-process TPU perf session: block sweeps + decode trace + MXU probes.

Groups every round-2 perf experiment into a single sequential process so the
4-core host compiles one program at a time (concurrent compile jobs thrash).

Run: PYTHONPATH=.:/root/.axon_site python scripts/perf_session.py [part...]
Parts: fwdblocks bwdblocks decode mxu (default: all)
"""

import glob
import gzip
import json
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from depth_completion_tpu.ops import flash_attention as fa


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args, iters=8, flops=None):
    sync(fn(*args))
    t0 = time.time()
    sync(fn(*args))
    t1 = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    tn = time.time() - t0
    ms = (tn - t1) / (iters - 1) * 1000
    extra = f"  {flops / (ms / 1000) / 1e12:7.1f} TFLOP/s" if flops else ""
    print(f"{name:52s} {ms:8.3f} ms{extra}", flush=True)
    return ms


def make_qkv(s=72 * 96, c=320, batch=1, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(batch, s, c)) * 0.1, jnp.bfloat16)
    return mk(), mk(), mk()


def part_fwdblocks():
    print("== flash fwd block sweep (S=6912, 5 heads, d=64) ==", flush=True)
    q, k, v = make_qkv()
    flops = 2 * 2 * 6912 * 6912 * 64 * 5
    for bq, bk in [(256, 512), (512, 512), (512, 1024), (1024, 512),
                   (1024, 1024), (512, 2048), (2048, 512), (1024, 2048),
                   (768, 1024), (512, 3584)]:
        f = jax.jit(lambda q, k, v, bq=bq, bk=bk: fa.flash_attention(
            q, k, v, 5, block_q=bq, block_k=bk))
        try:
            timed(f"fwd bq={bq} bk={bk}", f, q, k, v, flops=flops)
        except Exception as e:  # noqa: BLE001
            print(f"fwd bq={bq} bk={bk}: FAILED {type(e).__name__}", flush=True)


def part_bwdblocks():
    print("== flash fwd+bwd block sweep (fwd fixed 512x1024) ==", flush=True)
    q, k, v = make_qkv()
    flops = 7 * 2 * 6912 * 6912 * 64 * 5
    for bbq, bbk in [(512, 512), (1024, 512), (512, 1024), (1024, 1024),
                     (2048, 1024), (1024, 2048), (512, 2048), (2048, 512),
                     (896, 1024)]:
        g = jax.jit(jax.grad(
            lambda q, k, v, bbq=bbq, bbk=bbk: jnp.sum(fa.flash_attention(
                q, k, v, 5, block_q=512, block_k=1024,
                bwd_block_q=bbq, bwd_block_k=bbk).astype(jnp.float32)),
            argnums=(0, 1, 2)))
        try:
            timed(f"f+b bbq={bbq} bbk={bbk}", g, q, k, v, iters=6, flops=flops)
        except Exception as e:  # noqa: BLE001
            print(f"f+b bbq={bbq} bbk={bbk}: FAILED {type(e).__name__}", flush=True)


def part_decode():
    print("== taesd decode fwd+bwd trace ==", flush=True)
    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle

    bundle = make_random_bundle(
        seed=0, unet_config=registry.MARIGOLD_UNET_CONFIG, vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG, text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16)
    lat = jnp.zeros((1, 72, 96, 4), jnp.bfloat16)
    dgrad = jax.jit(jax.grad(
        lambda z: jnp.sum(bundle.vae.decode(z).astype(jnp.float32))))
    sync(dgrad(lat))
    logdir = "/tmp/dct_trace_dec"
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(3):
            out = dgrad(lat)
        sync(out)
        time.sleep(0.3)
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    by = {}
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if "TPU" not in pid_names.get(ev.get("pid"), ""):
            continue
        n = ev.get("name", "?")
        if n.startswith("jit_") or re.fullmatch(r"\d+", n):
            continue
        d = by.setdefault(n, [0.0, 0])
        d[0] += ev.get("dur", 0) / 1e3
        d[1] += 1
    total = sum(v[0] for v in by.values()) / 3
    print(f"decode total/call {total:.2f} ms", flush=True)
    for n, (ms, c) in sorted(by.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"{ms/3:8.3f} x{c:3d}  {n[:90]}", flush=True)


def part_mxu():
    print("== MXU shape probes ==", flush=True)
    S = 7168
    rng = np.random.default_rng(0)

    def bmm(g, m, k, n):
        a = jnp.asarray(rng.normal(size=(g, m, k)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(g, k, n)) * 0.1, jnp.bfloat16)
        f = jax.jit(lambda a, b: jnp.einsum(
            "gmk,gkn->gmn", a, b, preferred_element_type=jnp.float32))
        timed(f"bmm {g}x[{m},{k}]x[{k},{n}]", f, a, b,
              flops=2 * g * m * k * n)

    bmm(5, S, 64, S)
    bmm(5, S, 128, S)
    bmm(5, S, S, 64)
    bmm(5, S, S, 128)
    nk = 7
    dqp = jnp.asarray(rng.normal(size=(nk, 5, S, 64)), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x, axis=0))
    timed(f"sum dq partials {nk}x[5,{S},64] fp32", f, dqp)


PARTS = {"fwdblocks": part_fwdblocks, "bwdblocks": part_bwdblocks,
         "decode": part_decode, "mxu": part_mxu}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PARTS)
    for n in names:
        PARTS[n]()
