"""Trace the UNet fwd+bwd and annotate per-op device times with their HLO.

Correlates TraceViewer op names (fusion.N, transpose_jvp___.N, ...) with the
optimized HLO module to classify where the non-kernel milliseconds go
(convolution / dot / transpose / elementwise / copy). Prints a category
rollup and the top ops with their defining HLO line.

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_hlo.py
"""

import glob
import gzip
import json
import re
import time

import jax
import jax.numpy as jnp

from depth_completion_tpu.models import registry
from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.models.unet import apply_unet
from depth_completion_tpu.ops.flash_attention import flash_attention


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def main():
    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16,
    )
    cfg = bundle.unet_config
    eh, ew = 72, 96
    x = jnp.zeros((1, eh, ew, 8), jnp.bfloat16)
    lat = jnp.zeros((1, eh, ew, 4), jnp.bfloat16)
    ctx = jnp.broadcast_to(bundle.text_context, (1,) + bundle.text_context.shape[1:])
    t = jnp.asarray(500)

    fn = jax.jit(
        jax.grad(
            lambda z, p: jnp.sum(
                apply_unet(
                    p, jnp.concatenate([x[..., :4], z], axis=-1), t, ctx, cfg,
                    attention_fn=flash_attention, remat=False,
                ).astype(jnp.float32)
            )
        )
    )
    compiled = fn.lower(lat, bundle.unet_params).compile()
    hlo = compiled.as_text()
    sync(compiled(lat, bundle.unet_params))

    logdir = "/tmp/dct_trace_hlo"
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(3):
            out = compiled(lat, bundle.unet_params)
        sync(out)
        time.sleep(0.3)

    # HLO name -> (opcode summary, def line)
    defs = {}
    fusion_bodies = {}
    cur_comp = None
    for line in hlo.splitlines():
        mm = re.match(r"\s*(%?)([\w.\-]+)\s*=\s*\S+\s+(\w+)\(", line)
        cm = re.match(r"\s*%?([\w.\-]+)\s+\([^)]*\)\s*->", line)
        if cm:
            cur_comp = cm.group(1)
        if mm:
            name, op = mm.group(2), mm.group(3)
            defs[name] = (op, line.strip()[:180])
            if cur_comp and op in ("convolution", "dot", "custom-call", "scatter"):
                fusion_bodies.setdefault(cur_comp, []).append(op)

    def classify(name):
        d = defs.get(name)
        if d is None:
            # trace names may drop %-prefix or suffixes
            return ("unknown", "")
        op, line = d
        if op == "fusion":
            # which computation does it call?
            m = re.search(r"calls=%?([\w.\-]+)", line)
            body = fusion_bodies.get(m.group(1), []) if m else []
            if "convolution" in body:
                return ("conv-fusion", line)
            if "dot" in body:
                return ("dot-fusion", line)
            return ("elementwise-fusion", line)
        if op == "custom-call":
            tgt = re.search(r'custom_call_target="([^"]+)"', line)
            return (f"custom:{tgt.group(1) if tgt else '?'}"[:40], line)
        return (op, line)

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
        if "TPU" not in pid_names.get(ev.get("pid"), ""):
            continue
        name = ev.get("name", "?")
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue  # program-level / step rows
        by_name.setdefault(name, [0.0, 0])
        by_name[name][0] += ev.get("dur", 0) / 1e3
        by_name[name][1] += 1

    cats = {}
    rows = []
    for name, (ms, cnt) in by_name.items():
        cat, line = classify(name)
        cats.setdefault(cat, 0.0)
        cats[cat] += ms / 3
        rows.append((ms / 3, cnt, name, cat, line))

    total = sum(cats.values())
    print(f"\n== category rollup (ms per unet fwd+bwd call, total {total:.2f}) ==")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.3f} ms  {cat}")

    print("\n== top ops ==")
    for ms, cnt, name, cat, line in sorted(rows, reverse=True)[:45]:
        print(f"{ms:8.3f} ms x{cnt:3d} [{cat:>18s}] {name:28s} {line[:120]}")


if __name__ == "__main__":
    main()
