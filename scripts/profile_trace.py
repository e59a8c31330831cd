"""Device-op-level trace of the guided step: where do the milliseconds go?

Traces the jitted UNet fwd+bwd (the hot 45 ms) with jax.profiler, converts
the xplane to op stats via tensorboard_plugin_profile, and prints the top
ops grouped by category. Run: PYTHONPATH=.:/root/.axon_site python
scripts/profile_trace.py [full]
"""

import glob
import gzip
import json
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

    grad = jax.jit(
        jax.grad(
            lambda z, p: jnp.sum(
                apply_unet(
                    p, jnp.concatenate([x[..., :4], z], axis=-1), t, ctx, cfg,
                    attention_fn=flash_attention, remat=False,
                ).astype(jnp.float32)
            )
        )
    )
    dgrad = jax.jit(jax.grad(lambda z: jnp.sum(bundle.vae.decode(z).astype(jnp.float32))))

    sync(grad(lat, bundle.unet_params))  # compile
    sync(dgrad(lat))

    logdir = "/tmp/dct_trace"
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = grad(lat, bundle.unet_params)
        sync(out)
        for _ in range(3):
            out = dgrad(lat)
        sync(out)
        time.sleep(0.5)

    # Find the trace.json.gz that the profiler wrote (TraceViewer format).
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        # Convert xplane → trace_viewer json via the tensorboard plugin.
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        xplanes = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
        print("xplanes:", xplanes)
        data, _ = rtd.xspace_to_tool_data(xplanes[-1:], "trace_viewer", {})
        events = json.loads(data)["traceEvents"]
    else:
        with gzip.open(paths[-1], "rt") as f:
            events = json.load(f)["traceEvents"]

    # Aggregate complete events on device tracks (TensorCore ops).
    by_name = {}
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in events:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "Chip" not in pname and "XLA" not in pname:
            continue
        name = ev.get("name", "?")
        by_name.setdefault(name, [0.0, 0])
        by_name[name][0] += ev.get("dur", 0) / 1e3  # us → ms
        by_name[name][1] += 1
    total = sum(v[0] for v in by_name.values())
    print(f"\ntracks: {sorted(set(pid_names.values()))}")
    print(f"total device op time (3 unet f+b + 3 decode f+b): {total:.2f} ms\n")
    for name, (ms, cnt) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:60]:
        print(f"{ms/3:9.3f} ms/call  x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
