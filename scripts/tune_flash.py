"""Block-size sweep for the flash attention kernels at UNet stage-0 geometry.

PYTHONPATH=.:/root/.axon_site python scripts/tune_flash.py
"""

import time

import jax
import jax.numpy as jnp

from depth_completion_tpu.ops.flash_attention import flash_attention


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args, iters=8):
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
    per_call = (tn - t1) / (iters - 1)
    print(f"{name:40s} {per_call*1000:8.2f} ms/call", flush=True)


def main():
    s, heads, c = 72 * 96, 5, 320
    q = jnp.zeros((1, s, c), jnp.bfloat16)

    for bq, bk in [(256, 256), (512, 256), (512, 512), (1024, 512), (512, 1024), (1024, 1024)]:
        f = jax.jit(
            lambda q, bq=bq, bk=bk: flash_attention(
                q, q, q, heads, block_q=bq, block_k=bk
            )
        )
        timed(f"fwd bq={bq} bk={bk}", f, q)
        g = jax.jit(
            jax.grad(
                lambda q, bq=bq, bk=bk: jnp.sum(
                    flash_attention(q, q, q, heads, block_q=bq, block_k=bk).astype(
                        jnp.float32
                    )
                )
            )
        )
        timed(f"fwd+bwd bq={bq} bk={bk}", g, q, iters=5)


if __name__ == "__main__":
    main()
