"""Probe: does the fused flash backward fit VMEM at the KL-VAE mid-attention
geometry (num_heads=1, d=512, S=H·W)?

The two-stream backward body (BWD_STREAMS=2) holds two score/p/ds/dp tile
sets; it was verified on-device only at the UNet stage-0 geometry (d=64).
The KL VAE (`models/vae_kl.py:94`) calls the same kernel with d=512 under
grad (guided loss differentiates through the decoder), where the per-stream
[rows, d] q/do/o blocks and [block_k, d] k/v/dk/dv tiles are 8x larger.

This script sweeps (BWD_STREAMS, bwd_block_q, bwd_block_k) at that geometry
on the current backend and reports compile success + per-call wall time, so
the gate in `ops/flash_attention.py` encodes measured fits, not guesses.

Usage: python scripts/exp_vae_flash_vmem.py   (run on the TPU host)
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

import jax
import jax.numpy as jnp
import numpy as np

from depth_completion_tpu.ops import flash_attention as fa

S, C, HEADS = 6912, 512, 1  # 72x96 latent at processing res 768
REPS = 10


def run_case(streams: int, bbq: int, bbk: int):
    old = fa.BWD_STREAMS
    fa.BWD_STREAMS = streams
    try:
        def loss(q, k, v):
            o = fa.flash_attention(
                q, k, v, HEADS, bwd_block_q=bbq, bwd_block_k=bbk
            )
            return jnp.sum(o.astype(jnp.float32) ** 2)

        vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        key = jax.random.PRNGKey(0)
        q, k, v = (
            jax.random.normal(k_, (1, S, C), jnp.bfloat16)
            for k_ in jax.random.split(key, 3)
        )

        def sync():
            val, g = vg(q, k, v)
            return float(val), float(jnp.sum(g[0].astype(jnp.float32)))

        t0 = time.time()
        val, gsum = sync()
        compile_s = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            sync()
            times.append(time.time() - t0)
        return dict(
            ok=True, compile_s=round(compile_s, 1),
            ms=round(float(np.min(times)) * 1e3, 2),
            val=val, gsum=gsum,
        )
    except Exception as e:  # Mosaic VMEM failures surface as XlaRuntimeError
        return dict(ok=False, err=f"{type(e).__name__}: {str(e)[:200]}")
    finally:
        fa.BWD_STREAMS = old


def main():
    print(f"backend={jax.default_backend()} S={S} C={C} heads={HEADS}")
    for streams in (1, 2):
        for bbq, bbk in ((512, 1024), (512, 512), (256, 512)):
            r = run_case(streams, bbq, bbk)
            print(f"streams={streams} bwd_blocks=({bbq},{bbk}) -> {r}")


if __name__ == "__main__":
    main()
