"""Quick A/B of the flash kernels at default blocks (exp2/mask-tail work).

Times fwd and fwd+bwd at the three UNet attention geometries of the smoke
config. Compare against PERF.md / git history for the pre-exp2 numbers.

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_flash_exp2.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

from depth_completion_tpu.core.compile_cache import enable_compile_cache

enable_compile_cache()

from depth_completion_tpu.ops.flash_attention import flash_attention


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args, iters=16):
    sync(fn(*args))  # compile
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    per_call = (time.time() - t0) / iters
    print(f"{name:44s} {per_call*1000:8.3f} ms/call", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    # (S, heads, C, block candidates): UNet levels 0/1 at the 72x96 smoke
    # latent. Besides the shipped default (512q/1024k), sweep blocks that
    # divide S exactly — no padding, and the tail mask compiles away:
    #   S=6912 = 9x768  -> (768,768)
    #   S=1728 pads to 2048 today (+40% QK/PV work); 256-blocks pad to 1792
    cases = [
        (72 * 96, 5, 320, [(512, 1024), (768, 768), (768, 1024)]),
        (
            36 * 48,
            10,
            640,
            [
                (512, 1024),  # shipped default: pads 1728 -> 2048 (+40% QK/PV)
                (512, 512),
                (256, 256),  # pads to 1792 (+3.7%)
                (256, 896),  # lcm 1792: minimal pad with a wide KV block
                (128, 1792),  # minimal pad, single KV block
                (256, 1792),
            ],
        ),
    ]
    for s, heads, c, blocks in cases:
        q = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (1, s, c), jnp.bfloat16)
        for bq, bk in blocks:
            kw = dict(block_q=bq, block_k=bk, bwd_block_q=bq, bwd_block_k=bk)

            f = jax.jit(lambda q, kw=kw: flash_attention(q, q, q, heads, **kw))
            timed(f"fwd   S={s} h={heads} b={bq}x{bk}", f, q)
            g = jax.jit(
                jax.grad(
                    lambda q, kw=kw: jnp.sum(
                        flash_attention(q, q, q, heads, **kw).astype(jnp.float32)
                        ** 2
                    )
                )
            )
            timed(f"f+bwd S={s} h={heads} b={bq}x{bk}", g, q)


if __name__ == "__main__":
    main()
