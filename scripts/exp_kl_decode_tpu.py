"""A/B the KL VAE (--vae full) decode path upgrades on the TPU.

Measures, at smoke geometry (72×96 latent → 576×768 output, bf16), decode
fwd and fwd+bwd (grad w.r.t. latents — the guidance path under --vae full):

  1. DCT_CONV_KERNEL=off  : XLA convs (+ flash mid-attention + subpixel
     upsampler, which have no env gates — compare against git history for
     the pre-upgrade numbers)
  2. DCT_CONV_KERNEL=on   : fused Pallas conv3x3 where supported

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_kl_decode_tpu.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

from depth_completion_tpu.core.compile_cache import enable_compile_cache
from depth_completion_tpu.models import registry, vae_kl

enable_compile_cache()


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def bench(name, fn, *args, n=10):
    t0 = time.time()
    sync(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    sync(outs[-1])
    dt = (time.time() - t0) / n * 1000
    print(f"{name:48s} {dt:8.2f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    cfg = registry.SD_VAE_CONFIG
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), vae_kl.init_vae(k, cfg)
        )
    )(jax.random.PRNGKey(0))
    lat = 0.2 * jax.random.normal(
        jax.random.PRNGKey(1), (1, 72, 96, cfg.latent_channels), jnp.bfloat16
    )

    for mode in ("off", "on"):
        os.environ["DCT_CONV_KERNEL"] = mode

        @jax.jit
        def dec(z):
            return vae_kl.decode(params, z, cfg)

        @jax.jit
        def dgrad(z):
            return jax.grad(
                lambda zz: jnp.sum(vae_kl.decode(params, zz, cfg).astype(jnp.float32))
            )(z)

        # The real guidance path: the depth head. Composed = the pre-fusion
        # form (decode → mean_rgb → clip); fused = vae_kl.decode_depth
        # (conv3x3_mean_tap head). clip makes the cotangent data-dependent —
        # without it XLA folds the head conv when dy is constant (PERF.md).
        def composed(zz):
            rgb = vae_kl.decode(params, zz, cfg)
            d = jnp.clip(jnp.mean(rgb, axis=-1, keepdims=True), -1.0, 1.0)
            return (d + 1.0) / 2.0

        @jax.jit
        def hgrad_composed(z):
            return jax.grad(
                lambda zz: jnp.sum(jnp.square(composed(zz)).astype(jnp.float32))
            )(z)

        @jax.jit
        def hgrad_fused(z):
            return jax.grad(
                lambda zz: jnp.sum(
                    jnp.square(vae_kl.decode_depth(params, zz, cfg)).astype(
                        jnp.float32
                    )
                )
            )(z)

        fwd = bench(f"kl decode fwd   (conv kernel {mode})", dec, lat)
        fb = bench(f"kl decode f+bwd (conv kernel {mode})", dgrad, lat)
        hc = bench(f"kl depth head composed f+bwd (conv {mode})", hgrad_composed, lat)
        hf = bench(f"kl depth head fused    f+bwd (conv {mode})", hgrad_fused, lat)
        print(
            f"  -> {mode}: fwd {fwd:.2f} ms, fwd+bwd {fb:.2f} ms, "
            f"head composed {hc:.2f} ms, head fused {hf:.2f} ms",
            flush=True,
        )

    # numerical check between the two conv paths
    os.environ["DCT_CONV_KERNEL"] = "off"
    ref = jax.jit(lambda z: vae_kl.decode(params, z, cfg))(lat)
    os.environ["DCT_CONV_KERNEL"] = "on"
    got = jax.jit(lambda z: vae_kl.decode(params, z, cfg))(lat)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"max |on - off| = {err:.3e}")


if __name__ == "__main__":
    main()
