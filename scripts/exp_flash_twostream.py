"""Two-stream flash fwd: can Mosaic interleave MXU and VPU across streams?

If exp_flash_overlap shows the fwd body serializes (QK dot -> softmax ->
PV dot, MXU idle during softmax and vice versa), a body that processes TWO
independent q-blocks of the same head gives the scheduler freedom to run
stream A's softmax while stream B's dots occupy the MXU.

This is a self-contained fwd-only replica of ops/flash_attention._fwd with
a 2-q-block body ("twostream") vs the plain body ("single"), measured at
UNet stage-0 geometry (padded S=7168, 5 heads, d=64). Numerics are checked
against the single-stream output.

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_flash_twostream.py
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LOG2E = 1.4426950408889634


def _single_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc,
                   *, sm_scale, num_kv_blocks):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (sm_scale * LOG2E)
    m_prev = m_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, :1])
    l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    v = v_ref[0]
    o_curr = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc[...] = acc[...] * alpha[:, : acc.shape[-1]] + o_curr

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l_inv = jnp.where(l_scr[...] == 0.0, 1.0, 1.0 / l_scr[...])
        o_ref[0] = (acc[...] * l_inv[:, : acc.shape[-1]]).astype(o_ref.dtype)


def _twostream_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc,
                      *, sm_scale, num_kv_blocks, block_q):
    """Block holds 2*block_q rows; the body runs two independent streams."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    k = k_ref[0]
    v = v_ref[0]
    for h in range(2):
        sl = slice(h * block_q, (h + 1) * block_q)
        q = q_ref[0][sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * LOG2E)
        m_prev = m_scr[sl]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_scr[sl] = alpha * l_scr[sl] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[sl] = m_next
        o_curr = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc[sl] = acc[sl] * alpha[:, : acc.shape[-1]] + o_curr

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l_inv = jnp.where(l_scr[...] == 0.0, 1.0, 1.0 / l_scr[...])
        o_ref[0] = (acc[...] * l_inv[:, : acc.shape[-1]]).astype(o_ref.dtype)


def _fwd(q, k, v, sm_scale, block_q, block_k, twostream):
    bh, sq, d = q.shape
    sk = k.shape[1]
    rows = 2 * block_q if twostream else block_q
    grid = (bh, sq // rows, sk // block_k)
    if twostream:
        kernel = functools.partial(
            _twostream_kernel, sm_scale=sm_scale,
            num_kv_blocks=sk // block_k, block_q=block_q,
        )
    else:
        kernel = functools.partial(
            _single_kernel, sm_scale=sm_scale, num_kv_blocks=sk // block_k,
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)


def timed(name, fn, *args, iters=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.3f} ms/call", flush=True)
    return out, dt


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    bh, s, d = 5, 7168, 64
    rng = jax.random.PRNGKey(0)
    q = 0.3 * jax.random.normal(rng, (bh, s, d), jnp.bfloat16)
    k = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, s, d), jnp.bfloat16)
    sm = 1.0 / d**0.5

    for bq, bk in [(512, 1024), (512, 512), (256, 1024)]:
        o1, t1 = timed(
            f"single    bq={bq} bk={bk}",
            jax.jit(lambda q, k, v: _fwd(q, k, v, sm, bq, bk, False)), q, k, v,
        )
        o2, t2 = timed(
            f"twostream bq={bq} bk={bk}",
            jax.jit(lambda q, k, v: _fwd(q, k, v, sm, bq, bk, True)), q, k, v,
        )
        err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
        print(f"  -> speedup {t1/t2:.2f}x, max|diff| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
