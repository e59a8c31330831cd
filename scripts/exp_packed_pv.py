"""In-kernel probe: is a Pallas N=64 MXU dot worse than 2x-packed N=128?

PERF.md's HBM-resident probes show [S,S]x[S,64] running 3.2x slower per
FLOP than [S,S]x[S,128] — if that asymmetry holds for VMEM-resident tiles
inside a kernel, the flash PV/dq/dk/dv dots (all N=64 outputs) could be
packed two-heads-wide (p [bq,2bk] x block-diag v [2bk,128]) for a ~1.6x
win on those dots. If the in-kernel penalty is exactly 2x (half the MXU
output columns), packing is cycle-neutral and not worth the complexity.

Measures, VMEM-resident, grid-iterated to amortize launch overhead:
  A: [bq,bk] x [bk,64]    (the flash PV shape, per head)  x2 heads
  B: [bq,2bk] x [2bk,128] (two heads packed, block-diag KV — same useful
     FLOPs as A x2, executed as one full-width dot with 2x junk MACs)

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_packed_pv.py
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

BQ, BK = 512, 1024
REPS = 64  # inner grid steps per call


def _kern_n64(p_ref, v_ref, o_ref, acc):
    acc[...] += jax.lax.dot_general(
        p_ref[0], v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = acc[...].astype(o_ref.dtype)


def _run(n_out, bk):
    p = jax.random.normal(jax.random.PRNGKey(0), (REPS, BQ, bk), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (REPS, bk, n_out), jnp.bfloat16)
    fn = pl.pallas_call(
        _kern_n64,
        grid=(REPS,),
        in_specs=[
            pl.BlockSpec((1, BQ, bk), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, bk, n_out), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, n_out), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((REPS, BQ, n_out), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BQ, n_out), jnp.float32)],
    )
    fn = jax.jit(fn)
    jax.block_until_ready(fn(p, v))
    t0 = time.time()
    outs = [fn(p, v) for _ in range(20)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / 20
    macs = REPS * BQ * bk * n_out
    print(
        f"  [{BQ},{bk}]x[{bk},{n_out}] x{REPS}: {dt*1e3:8.3f} ms  "
        f"{2*macs/dt/1e12:7.1f} TF/s executed",
        flush=True,
    )
    return dt


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    print("A: per-head N=64 dots (flash PV shape), run twice for two heads")
    ta = _run(64, BK)
    print("B: two heads packed — one N=128 dot over 2bk (2x executed MACs)")
    tb = _run(128, 2 * BK)
    print(
        f"\nA x2 (two heads) = {2*ta*1e3:.3f} ms vs B packed = {tb*1e3:.3f} ms"
        f"  -> packing {'WINS' if tb < 2 * ta * 0.95 else 'neutral/loses'}"
        f" ({2*ta/tb:.2f}x)"
    )


if __name__ == "__main__":
    main()
