"""On-device validation of the flash-tiled ring attention lowering.

Real multi-chip hardware is unavailable (1 chip); this validates what CAN
be validated on one chip: the Pallas flash kernels compile and execute
under ``shard_map`` (Mosaic lowering inside a mesh context) on a 1-device
mesh (p=1 ring, self-loop ppermute), forward and backward, at the UNet
stage-0 geometry — and match the plain flash path bit-for-bit (p=1 ring is
one full-sequence flash call plus the merge arithmetic).

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_ring_tpu.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from depth_completion_tpu.core.mesh import AXIS_DATA, AXIS_MODEL
from depth_completion_tpu.ops.flash_attention import flash_attention
from depth_completion_tpu.ops.ring_attention import ring_attention_sharded


def main():
    print("backend:", jax.default_backend(), flush=True)
    devs = np.asarray(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(devs, (AXIS_DATA, AXIS_MODEL))
    s, c, heads = 72 * 96, 320, 5
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(kk, (1, s, c), jnp.bfloat16)
        for kk in jax.random.split(key, 3)
    )

    ring = jax.jit(
        lambda q, k, v: ring_attention_sharded(
            q, k, v, heads, mesh, use_flash="on"
        )
    )
    plain = jax.jit(lambda q, k, v: flash_attention(q, k, v, heads))
    o_ring = ring(q, k, v)
    o_plain = plain(q, k, v)
    err = float(jnp.max(jnp.abs(o_ring.astype(jnp.float32) - o_plain.astype(jnp.float32))))
    print(f"fwd p=1 ring vs plain flash: max err {err:.3e}", flush=True)

    g_ring = jax.jit(
        jax.grad(
            lambda q, k, v: jnp.sum(
                ring_attention_sharded(
                    q, k, v, heads, mesh, use_flash="on"
                ).astype(jnp.float32) ** 2
            ),
            argnums=(0, 1, 2),
        )
    )(q, k, v)
    g_plain = jax.jit(
        jax.grad(
            lambda q, k, v: jnp.sum(
                flash_attention(q, k, v, heads).astype(jnp.float32) ** 2
            ),
            argnums=(0, 1, 2),
        )
    )(q, k, v)
    for a, b, name in zip(g_ring, g_plain, "qkv"):
        gerr = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-9
        print(f"bwd d{name}: max err {gerr:.3e} (rel {gerr / scale:.3e})", flush=True)
    print("ring-on-TPU lowering OK")


if __name__ == "__main__":
    main()
