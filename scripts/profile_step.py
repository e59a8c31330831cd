"""Localize per-step time: UNet fwd, fwd+bwd, decode head, full guided step.

Run on the TPU (axon) backend. Sync via scalar fetch (block_until_ready is a
no-op over the tunnel).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from depth_completion_tpu.models import registry
from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.models.unet import apply_unet
from depth_completion_tpu.ops.resize import resize_antialias
from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def bench(name, fn, *args, n=3):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:35s} {min(ts)*1000:9.1f} ms")
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
    eh, ew = 72, 96  # 480x640 at res 768
    x = jnp.zeros((1, eh, ew, 8), jnp.bfloat16)
    lat = jnp.zeros((1, eh, ew, 4), jnp.bfloat16)
    ctx = jnp.broadcast_to(bundle.text_context, (1,) + bundle.text_context.shape[1:])
    t = jnp.asarray(500)

    for flash in (True, False):
        if flash:
            from depth_completion_tpu.ops.flash_attention import flash_attention as afn
        else:
            from depth_completion_tpu.models.layers import attention as afn
        tag = "flash" if flash else "xla"

        fwd = jax.jit(
            lambda p, x: apply_unet(p, x, t, ctx, bundle.unet_config, attention_fn=afn)
        )
        bench(f"unet fwd ({tag})", fwd, bundle.unet_params, x)

        grad = jax.jit(
            jax.grad(
                lambda z, p: jnp.sum(
                    apply_unet(
                        p,
                        jnp.concatenate([x[..., :4], z], axis=-1),
                        t,
                        ctx,
                        bundle.unet_config,
                        attention_fn=afn,
                        remat=True,
                    ).astype(jnp.float32)
                )
            )
        )
        bench(f"unet fwd+bwd remat ({tag})", grad, lat, bundle.unet_params)

    dec = jax.jit(lambda p, z: bundle.vae.decode(z))
    bench("taesd decode fwd", dec, bundle.vae.params, lat)
    dgrad = jax.jit(
        jax.grad(lambda z: jnp.sum(bundle.vae.decode(z).astype(jnp.float32)))
    )
    bench("taesd decode fwd+bwd", dgrad, lat)

    img = jnp.zeros((1, 576, 768, 1), jnp.float32)
    rs = jax.jit(lambda a: resize_antialias(a, (480, 640)))
    bench("resize 576x768->480x640", rs, img)
    rsg = jax.jit(
        jax.grad(lambda a: jnp.sum(resize_antialias(a, (480, 640))))
    )
    bench("resize grad", rsg, img)

    # one full guided step
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, size=(1, 480, 640, 3)), jnp.float32)
    sparse_np = np.zeros((1, 480, 640, 1), np.float32)
    sparse_np[0, ::20, ::20, 0] = 10.0
    sparse = jnp.asarray(sparse_np)
    for steps in (1, 2):
        cfg = SamplerConfig(
            steps=steps, resolution=768, closed_form=False, norm="const"
        )
        fn = jax.jit(guided_sample, static_argnames=("cfg",))
        bench(f"guided_sample steps={steps}", fn, bundle, images, sparse, cfg, n=2)


if __name__ == "__main__":
    main()
