"""A/B the fused Pallas conv3x3 TAESD decode path on the TPU.

Measures, at smoke geometry (72×96 latent → 576×768 output, bf16):
  1. decode fwd        : XLA packed convs vs Pallas conv3x3_fused
  2. decode fwd+bwd (grad wrt latents, the guidance path) for both
  3. decode_depth fused head vs composed decode→mean→clip

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_conv3x3_tpu.py
(sets the compile cache; flips DCT_CONV_KERNEL between traces in-process).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

from depth_completion_tpu.core.compile_cache import enable_compile_cache
from depth_completion_tpu.models import registry, vae_tiny

enable_compile_cache()


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def bench(name, fn, *args, n=30):
    t0 = time.time()
    sync(fn(*args))
    compile_s = time.time() - t0
    # chained dispatch: launch n, sync once
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    sync(outs[-1])
    dt = (time.time() - t0) / n * 1000
    print(f"{name:44s} {dt:8.2f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    cfg = registry.TAESD_CONFIG
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), vae_tiny.init_taesd(k, cfg)
        )
    )(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 72, 96, 4), jnp.bfloat16)

    def dec(z):
        return vae_tiny.decode(params, z, cfg)

    def dec_depth(z):
        return vae_tiny.decode_depth(params, z, cfg)

    def composed(z):
        rgb = dec(z)
        return (jnp.clip(jnp.mean(rgb, -1, keepdims=True), -1, 1) + 1) / 2

    def g(f):
        return jax.jit(jax.grad(lambda z: jnp.sum(f(z).astype(jnp.float32))))

    for mode in ("off", "on"):
        os.environ["DCT_CONV_KERNEL"] = mode
        tag = {"off": "xla", "on": "pallas"}[mode]
        bench(f"decode fwd            [{tag}]", jax.jit(dec), lat)
        bench(f"decode fwd+bwd        [{tag}]", g(dec), lat)
        bench(f"decode_depth fwd+bwd  [{tag}]", g(dec_depth), lat)
        bench(f"composed head fwd+bwd [{tag}]", g(composed), lat)

    # numerical check on-device, pallas vs xla
    os.environ["DCT_CONV_KERNEL"] = "off"
    ref = jax.jit(dec)(lat)
    gref = g(dec)(lat)
    os.environ["DCT_CONV_KERNEL"] = "on"
    got = jax.jit(dec)(lat)
    ggot = g(dec)(lat)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    gerr = float(jnp.max(jnp.abs(ggot.astype(jnp.float32) - gref.astype(jnp.float32))))
    rel = gerr / (float(jnp.max(jnp.abs(gref.astype(jnp.float32)))) + 1e-30)
    print(f"max |pallas - xla| decode: {err:.3e}   grad: {gerr:.3e} (rel {rel:.3e})")


if __name__ == "__main__":
    main()
