"""Diagnose MXU/VPU serialization in the flash fwd block step.

Roofline model of the fwd kernel at (512,1024,d=64): MXU ≈ 1.4 us/step
(QK+PV at the d=64 half-depth ceiling), VPU ≈ 1.2-2 us/step (softmax over
the [512,1024] f32 tile). Measured fwd (~8.3 ms at smoke geometry) matches
the SUM of the two, not the max — i.e. no MXU/VPU overlap inside the body.
This probe isolates that: grid-resident operands (index maps pinned to 0),
N steps of

  A: full block step   (QK dot -> online softmax -> PV dot)
  B: dots only         (QK, PV with a fixed p tile)
  C: softmax only      (max/exp2/sum on a resident score tile)

If t(A) ~= t(B) + t(C), the body serializes and head-pair batching (two
independent [bq,bk] streams per body, giving the scheduler interleaving
freedom) is worth building. If t(A) ~= max(t(B), t(C)), Mosaic already
overlaps and there is nothing to win.

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_flash_overlap.py
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

BQ, BK, D = 512, 1024, 64
STEPS = int(os.environ.get("PROBE_STEPS", "256"))
SCALE = 0.125 * 1.4426950408889634


def _body(mode, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    if mode in ("full", "dots"):
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * SCALE
    else:  # softmax-only: fake a resident score tile from scratch state
        s = l_scr[...][:, :1] + jnp.zeros((BQ, BK), jnp.float32)
    if mode in ("full", "softmax"):
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
    else:
        p = s  # dots-only: reuse the QK output as p
        alpha = m_scr[...]
    if mode in ("full", "dots"):
        o_curr = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc[...] = acc[...] * alpha[:, :D] + o_curr
    else:
        acc[...] = acc[...] + p[:, :D]
    o_ref[...] = acc[...].astype(o_ref.dtype)


def _run(mode):
    q = jax.random.normal(jax.random.PRNGKey(0), (BQ, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (BK, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BK, D), jnp.bfloat16)
    fn = pl.pallas_call(
        functools.partial(_body, mode),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((BQ, D), lambda i: (0, 0)),
            pl.BlockSpec((BK, D), lambda i: (0, 0)),
            pl.BlockSpec((BK, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BQ, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((BQ, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )
    fn = jax.jit(fn)
    jax.block_until_ready(fn(q, k, v))
    t0 = time.time()
    outs = [fn(q, k, v) for _ in range(20)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / 20
    print(f"{mode:8s}: {dt*1e6/STEPS:8.3f} us/step  ({dt*1e3:.3f} ms total)",
          flush=True)
    return dt


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    tf = _run("full")
    td = _run("dots")
    ts = _run("softmax")
    print(
        f"\nfull {tf*1e6/STEPS:.2f} vs dots+softmax {(td+ts)*1e6/STEPS:.2f}"
        f" vs max {max(td,ts)*1e6/STEPS:.2f} us/step -> "
        + ("SERIALIZED (head-pair batching would help)"
           if tf > 0.85 * (td + ts) else "overlapped")
    )


if __name__ == "__main__":
    main()
