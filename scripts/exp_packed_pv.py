"""In-kernel probe: is a Pallas N=64 MXU dot worse than 2x-packed N=128?

PERF.md's HBM-resident probes show [S,S]x[S,64] running 3.2x slower per
FLOP than [S,S]x[S,128]. If that asymmetry holds for VMEM-resident tiles
inside a kernel, the flash PV/dq/dk/dv dots (all N=64 outputs) could be
packed two-heads-wide (p [bq,2bk] x block-diag v [2bk,128]) for a ~1.6x
win on those dots. If the in-kernel penalty is exactly the 2x of half the
MXU output columns (the ceil-pass model), packing is cycle-neutral and not
worth the complexity.

Method: the grid revisits the same blocks (index maps pinned to 0), so
operands stay VMEM-resident and each grid step re-executes the dot with no
HBM streaming — pure MXU + pipeline time.

  A: [bq,bk] x [bk,64]     (flash PV shape, per head) — run for 2N steps
  B: [bq,2bk] x [2bk,128]  (two heads packed) — run for N steps
  equal useful work <=> time(B at N) vs time(A at 2N)

Run: PYTHONPATH=.:/root/.axon_site python scripts/exp_packed_pv.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ, BK = 512, 1024


def _kern(p_ref, v_ref, o_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        p_ref[...], v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc[...].astype(o_ref.dtype)


def _run(n_out, bk, steps):
    p = jax.random.normal(jax.random.PRNGKey(0), (BQ, bk), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (bk, n_out), jnp.bfloat16)
    fn = pl.pallas_call(
        _kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((BQ, bk), lambda i: (0, 0)),
            pl.BlockSpec((bk, n_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BQ, n_out), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((BQ, n_out), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BQ, n_out), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )
    fn = jax.jit(fn)
    jax.block_until_ready(fn(p, v))
    t0 = time.time()
    outs = [fn(p, v) for _ in range(20)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / 20
    macs = steps * BQ * bk * n_out
    print(
        f"  [{BQ},{bk}]x[{bk},{n_out}] x{steps}: {dt*1e3:8.3f} ms  "
        f"{2*macs/dt/1e12:7.1f} TF/s executed",
        flush=True,
    )
    return dt


def main():
    n = int(os.environ.get("PROBE_STEPS", "256"))
    print(f"backend: {jax.default_backend()}", flush=True)
    print("A: per-head N=64 dots (flash PV shape), 2N steps for two heads")
    ta = _run(64, BK, 2 * n)
    print("B: two heads packed - one N=128 dot over 2bk (2x executed MACs), N steps")
    tb = _run(128, 2 * BK, n)
    print(
        f"\nA(2N) = {ta*1e3:.3f} ms vs B(N) = {tb*1e3:.3f} ms"
        f"  -> packing {'WINS' if tb < ta * 0.95 else 'neutral/loses'}"
        f" ({ta/tb:.2f}x)"
    )


if __name__ == "__main__":
    main()
