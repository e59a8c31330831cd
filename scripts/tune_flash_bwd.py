"""Backward block-size sweep with forward blocks fixed at the tuned values."""

import time

import jax
import jax.numpy as jnp

from depth_completion_tpu.ops.flash_attention import flash_attention


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args, iters=6):
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
    print(f"{name:40s} {(tn - t1) / (iters - 1) * 1000:8.2f} ms/call", flush=True)


def main():
    s, heads, c = 72 * 96, 5, 320
    import numpy as np

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, s, c)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, s, c)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, s, c)) * 0.1, jnp.bfloat16)

    for bbq, bbk in [(512, 512), (1024, 512), (512, 1024), (1024, 1024), (2048, 1024), (1024, 2048)]:
        g = jax.jit(
            jax.grad(
                lambda q, k, v, bbq=bbq, bbk=bbk: jnp.sum(
                    flash_attention(
                        q, k, v, heads,
                        block_q=512, block_k=1024,
                        bwd_block_q=bbq, bwd_block_k=bbk,
                    ).astype(jnp.float32)
                ),
                argnums=(0, 1, 2),
            )
        )
        timed(f"fwd+bwd bbq={bbq} bbk={bbk}", g, q, k, v)


if __name__ == "__main__":
    main()
