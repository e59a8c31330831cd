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


# ---------------------------------------------------------------------------
# Flash-tiled ring body (TPU): Pallas kernels per visiting KV block
# ---------------------------------------------------------------------------


def _flash_ring_geometry(s_loc: int, d: int):
    """(block_q, block_k, s_pad) for the per-shard flash calls."""
    from depth_completion_tpu.ops import flash_attention as fa

    bq = min(512, fa._next_multiple(s_loc, fa._LANES))
    bk = bq  # square tiles keep fwd/bwd paddings identical
    s_pad = fa._next_multiple(s_loc, bq)
    return bq, bk, s_pad


def _make_flash_ring(num_heads: int, axis_name: str, sm_scale: float):
    """custom_vjp per-shard ring attention with flash-tiled block math.

    Forward: each visiting KV block runs the Pallas flash forward (which
    returns per-row m̂_b = m + log2 l in the kernels' exp2 domain) and is
    merged online with weights 2^{m̂_b}: since Σ_i∈b 2^{ŝ_i} = 2^{m̂_b}
    and o_b is the block-normalized output, the true softmax output is
    Σ_b o_b·2^{m̂_b} / Σ_b 2^{m̂_b}, accumulated stably against a running
    max M. The merged stat m̂_glob = M + log2 ΣW is EXACTLY the global
    flash residual, so the backward is a second ring pass reusing the
    fused one-pass backward kernel per visiting block: dq accumulates
    locally, dk/dv travel around the ring with their blocks (f32
    accumulators) and arrive home after a full rotation.
    """
    from depth_completion_tpu.ops import flash_attention as fa

    def split_heads(x, s_pad):
        n, s, c = x.shape
        hd = c // num_heads
        x = x.reshape(n, s, num_heads, hd).transpose(0, 2, 1, 3)
        x = x.reshape(n * num_heads, s, hd)
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        return x

    def merge_heads(x, n, s_loc, c):
        x = x[:, :s_loc, :].reshape(n, num_heads, s_loc, c // num_heads)
        return x.transpose(0, 2, 1, 3).reshape(n, s_loc, c)

    def fwd(q, k, v):
        n, s_loc, c = q.shape
        d = c // num_heads
        bq, bk, s_pad = _flash_ring_geometry(s_loc, d)
        p = jax.lax.axis_size(axis_name)
        qh = split_heads(q, s_pad)
        kh = split_heads(k, s_pad)
        vh = split_heads(v, s_pad)
        bh = qh.shape[0]

        def _vary(x):
            return jax.lax.pcast(x, axis_name, to="varying")

        m0 = _vary(jnp.full((bh, s_pad, 1), -jnp.inf, jnp.float32))
        w0 = _vary(jnp.zeros((bh, s_pad, 1), jnp.float32))
        acc0 = _vary(jnp.zeros((bh, s_pad, d), jnp.float32))

        def step(carry, _):
            m, w, acc, k_blk, v_blk = carry
            o_b, mhat_b = fa._fwd(qh, k_blk, v_blk, sm_scale, bq, bk, s_loc)
            mhat_b = mhat_b[:, :, :1]  # lane-replicated → [BH, S, 1]
            m_new = jnp.maximum(m, mhat_b)
            scale_old = fa._exp(m - m_new)
            scale_b = fa._exp(mhat_b - m_new)
            acc_new = acc * scale_old + o_b.astype(jnp.float32) * scale_b
            w_new = w * scale_old + scale_b
            perm = [(i, (i + 1) % p) for i in range(p)]
            k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
            return (m_new, w_new, acc_new, k_nxt, v_nxt), None

        (m, w, acc, _, _), _ = jax.lax.scan(
            step, (m0, w0, acc0, kh, vh), None, length=p
        )
        o_h = (acc / jnp.maximum(w, 1e-30)).astype(q.dtype)
        mhat_glob = m + fa._log(jnp.maximum(w, 1e-30))  # [BH, S, 1]
        out = merge_heads(o_h, n, s_loc, c)
        return out, (qh, kh, vh, o_h, mhat_glob, (n, s_loc, c))

    def bwd(res, dout):
        qh, kh, vh, o_h, mhat_glob, (n, s_loc, c) = res
        d = c // num_heads
        bq, bk, s_pad = _flash_ring_geometry(s_loc, d)
        p = jax.lax.axis_size(axis_name)
        do_h = split_heads(dout, s_pad)
        # the bwd kernel reads the stat lane-replicated
        mhat128 = jnp.broadcast_to(
            mhat_glob, (mhat_glob.shape[0], s_pad, fa._LANES)
        )

        def _vary(x):
            return jax.lax.pcast(x, axis_name, to="varying")

        dq0 = _vary(jnp.zeros(qh.shape, jnp.float32))
        dk0 = _vary(jnp.zeros(kh.shape, jnp.float32))
        dv0 = _vary(jnp.zeros(vh.shape, jnp.float32))

        def step(carry, _):
            dq_acc, k_blk, v_blk, dk_blk, dv_blk = carry
            dk_b, dv_b, dq_b = fa._fused_bwd_call(
                qh, k_blk, v_blk, do_h, mhat128, o_h,
                sm_scale, bq, bk, s_loc,
            )
            dq_acc = dq_acc + dq_b.astype(jnp.float32)
            dk_blk = dk_blk + dk_b.astype(jnp.float32)
            dv_blk = dv_blk + dv_b.astype(jnp.float32)
            perm = [(i, (i + 1) % p) for i in range(p)]
            rot = lambda x: jax.lax.ppermute(x, axis_name, perm)  # noqa: E731
            return (dq_acc, rot(k_blk), rot(v_blk), rot(dk_blk), rot(dv_blk)), None

        (dq_acc, _, _, dk_acc, dv_acc), _ = jax.lax.scan(
            step, (dq0, kh, vh, dk0, dv0), None, length=p
        )
        # after a full rotation dk/dv are home with every device's contribution
        dq = merge_heads(dq_acc, n, s_loc, c).astype(dout.dtype)
        dk = merge_heads(dk_acc, n, s_loc, c).astype(dout.dtype)
        dv = merge_heads(dv_acc, n, s_loc, c).astype(dout.dtype)
        return dq, dk, dv

    @jax.custom_vjp
    def ring_flash(q, k, v):
        return fwd(q, k, v)[0]

    ring_flash.defvjp(fwd, bwd)
    return ring_flash


def _flash_ring_supported(q: jnp.ndarray, num_heads: int) -> bool:
    from depth_completion_tpu.ops import flash_attention as fa

    c = q.shape[-1]
    if c % num_heads != 0:
        return False
    d = c // num_heads
    if d % fa._LANES != 0 and d != 64:
        return False
    return jax.default_backend() == "tpu" or fa.INTERPRET


def ring_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mesh: Mesh,
    axis_name: str = AXIS_DATA,
    use_flash: str = "auto",  # "auto" | "on" | "off"
) -> jnp.ndarray:
    """In-jit ring attention: usable as a ``models.unet`` attention_fn.

    Traceable inside a larger jitted program — GSPMD inserts the resharding
    collectives at the shard_map boundary, so the surrounding UNet can stay
    replicated (or batch-sharded) while the attention sequence is sharded
    over ``axis_name`` and KV blocks rotate around the ring. Differentiable
    (the guidance gradient flows through the ppermute transpose; the flash
    body carries a custom VJP whose second ring pass rotates dk/dv).

    On TPU the per-shard block math runs the Pallas flash kernels (scores
    only ever exist as VMEM tiles); elsewhere the XLA online-softmax body
    keeps the same semantics for tests.
    """
    s = q.shape[1]
    p = mesh.shape[axis_name]
    if s % p != 0:
        raise ValueError(f"sequence {s} not divisible by ring size {p}")
    flash = use_flash == "on" or (
        use_flash == "auto" and _flash_ring_supported(q, num_heads)
    )
    spec = PartitionSpec(None, axis_name, None)
    if flash:
        hd = q.shape[-1] // num_heads
        body = _make_flash_ring(num_heads, axis_name, 1.0 / math.sqrt(hd))
        # pallas_call's out_shape carries no varying-mesh-axes annotation,
        # so the vma consistency check cannot see through it.
        return jax.shard_map(
            body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(q, k, v)
    body = functools.partial(
        _ring_body, num_heads=num_heads, axis_name=axis_name
    )
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
