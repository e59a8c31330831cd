"""Localize per-step time: UNet fwd / fwd+bwd under flash vs XLA attention.

Run on the TPU (axon) backend from the repo root:
    PYTHONPATH=. python scripts/profile_step.py
Sync via scalar fetch (block_until_ready is a no-op over the tunnel); the
~25 ms tunnel round trip is included in every number.
"""

import time

import jax
import jax.numpy as jnp

from depth_completion_tpu.models import registry
from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.models.unet import apply_unet


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def bench(name, fn, *args, n=3):
    t0 = time.time()
    sync(fn(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:40s} {min(ts)*1000:9.1f} ms   (compile {compile_s:.0f}s)", flush=True)
    return min(ts)


def main():
    bundle = make_random_bundle(
        seed=0,
        unet_config=registry.MARIGOLD_UNET_CONFIG,
        vae_kind="tiny",
        vae_config=registry.TAESD_CONFIG,
        text_config=registry.TINY_TEXT_CONFIG,
        dtype=jnp.bfloat16,
    )
    eh, ew = 72, 96
    x = jnp.zeros((1, eh, ew, 8), jnp.bfloat16)
    lat = jnp.zeros((1, eh, ew, 4), jnp.bfloat16)
    ctx = jnp.broadcast_to(bundle.text_context, (1,) + bundle.text_context.shape[1:])
    t = jnp.asarray(500)

    from depth_completion_tpu.models.layers import attention as xla_attn
    from depth_completion_tpu.ops.flash_attention import flash_attention as flash

    for tag, afn in (("flash", flash), ("xla", xla_attn)):
        fwd = jax.jit(
            lambda p, x, afn=afn: apply_unet(
                p, x, t, ctx, bundle.unet_config, attention_fn=afn
            )
        )
        bench(f"unet fwd ({tag})", fwd, bundle.unet_params, x)

        grad = jax.jit(
            jax.grad(
                lambda z, p, afn=afn: jnp.sum(
                    apply_unet(
                        p,
                        jnp.concatenate([x[..., :4], z], axis=-1),
                        t,
                        ctx,
                        bundle.unet_config,
                        attention_fn=afn,
                        remat=False,
                    ).astype(jnp.float32)
                )
            )
        )
        bench(f"unet fwd+bwd ({tag}, no remat)", grad, lat, bundle.unet_params)

    dgrad = jax.jit(
        jax.grad(lambda z: jnp.sum(bundle.vae.decode(z).astype(jnp.float32)))
    )
    bench("taesd decode fwd+bwd", dgrad, lat)


if __name__ == "__main__":
    main()
