"""Ring attention: sequence-parallel attention over the device mesh.

The stretch capability beyond parity (SURVEY.md §5 "long-context"): a
native-resolution mode whose token count exceeds one chip's memory would
shard the sequence across devices. This implements blockwise (flash-style)
attention with the KV shard rotating around the mesh ring — each step
combines the local Q block with the visiting KV block under an online
softmax, then passes KV to the neighbor with ``jax.lax.ppermute`` (XLA
lowers it to ICI neighbor exchanges on TPU; the Pallas RDMA variant in
ops/flash_attention.py's module notes would overlap the hop with compute).

Expressed with ``shard_map`` so the same code runs on the virtual CPU mesh
(tests) and a real slice. Differentiable (ppermute has a transpose rule), so
it can sit on the guidance gradient path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from depth_completion_tpu.core.mesh import AXIS_DATA


def _local_scores(q, k, num_heads, sm_scale):
    """[N, Sq, C] × [N, Sk, C] → fp32 logits [N, H, Sq, Sk]."""
    n, sq, c = q.shape
    sk = k.shape[1]
    hd = c // num_heads
    qh = q.reshape(n, sq, num_heads, hd)
    kh = k.reshape(n, sk, num_heads, hd)
    return (
        jnp.einsum("nqhd,nkhd->nhqk", qh, kh, preferred_element_type=jnp.float32)
        * sm_scale
    )


def _ring_body(q, k, v, num_heads, axis_name):
    """Per-shard ring loop: local Q attends to every visiting KV block."""
    n, sq, c = q.shape
    hd = c // num_heads
    sm_scale = 1.0 / math.sqrt(hd)
    p = jax.lax.axis_size(axis_name)

    # pcast-to-varying: the accumulators become device-varying once they mix
    # with the sharded operands; mark the initial values so scan's carry
    # types match.
    def _vary(x):
        return jax.lax.pcast(x, axis_name, to="varying")

    m0 = _vary(jnp.full((n, num_heads, sq, 1), -jnp.inf, jnp.float32))
    l0 = _vary(jnp.zeros((n, num_heads, sq, 1), jnp.float32))
    acc0 = _vary(jnp.zeros((n, num_heads, sq, hd), jnp.float32))

    def step(carry, _):
        m, l_sum, acc, k_blk, v_blk = carry
        s = _local_scores(q, k_blk, num_heads, sm_scale)  # [N,H,Sq,Sk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p_blk = jnp.exp(s - m_new)
        l_new = l_sum * alpha + jnp.sum(p_blk, axis=-1, keepdims=True)
        vh = v_blk.reshape(n, -1, num_heads, hd)
        acc_new = acc * alpha + jnp.einsum(
            "nhqk,nkhd->nhqd", p_blk.astype(v_blk.dtype), vh,
            preferred_element_type=jnp.float32,
        )
        # rotate KV to the next device on the ring
        perm = [(i, (i + 1) % p) for i in range(p)]
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_new, l_new, acc_new, k_nxt, v_nxt), None

    (m, l_sum, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v), None, length=p
    )
    out = acc / jnp.maximum(l_sum, 1e-30)
    return out.transpose(0, 2, 1, 3).reshape(n, sq, c).astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mesh: Mesh,
    axis_name: str = AXIS_DATA,
) -> jnp.ndarray:
    """In-jit ring attention: usable as a ``models.unet`` attention_fn.

    Traceable inside a larger jitted program — GSPMD inserts the resharding
    collectives at the shard_map boundary, so the surrounding UNet can stay
    replicated (or batch-sharded) while the attention sequence is sharded
    over ``axis_name`` and KV blocks rotate around the ring. Differentiable
    (the guidance gradient flows through the ppermute transpose).
    """
    s = q.shape[1]
    p = mesh.shape[axis_name]
    if s % p != 0:
        raise ValueError(f"sequence {s} not divisible by ring size {p}")
    spec = PartitionSpec(None, axis_name, None)
    body = functools.partial(_ring_body, num_heads=num_heads, axis_name=axis_name)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mesh: Mesh,
    axis_name: str = AXIS_DATA,
) -> jnp.ndarray:
    """Full softmax attention with the sequence sharded over ``axis_name``.

    Host-level entry: places q/k/v sequence-sharded, then runs the ring.
    q/k/v: [N, S, C] with S divisible by the axis size. The result equals
    single-device attention (up to fp32 reduction order) while each device
    only ever holds S/P keys and values.
    """
    sharding = NamedSharding(mesh, PartitionSpec(None, axis_name, None))
    return ring_attention_sharded(
        jax.device_put(q, sharding),
        jax.device_put(k, sharding),
        jax.device_put(v, sharding),
        num_heads,
        mesh,
        axis_name,
    )
