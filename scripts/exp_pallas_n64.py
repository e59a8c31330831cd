"""Is an N=64-output MXU contraction beatable inside Pallas kernels?

The flash backward's three output matmuls (dv = p^T@do, dk = ds^T@q,
dq = ds@k) and the forward's PV all have head_dim=64 as the output minor
(lane) dimension. The round-2 XLA bmm probes (PERF.md) measured
[S,S]x[S,64] at 0.571 ms vs [S,S]x[S,128] at 0.357 ms — the N=64 output is
1.6x slower in ABSOLUTE time than N=128 despite half the MACs. Four ways
out, all measured here with realistic flash tile shapes (block_q=512,
block_k=1024, d=64), each variant doing TWO heads' worth of work per grid
step:

  A. baseline:    two dots [bq,bk]x[bk,64]        (output lanes = 64)
  B. block-diag:  one dot  [bq,2bk]x[2bk,128]     (2x MACs, full lanes)
  C. sum/diff:    two dots [bq,bk]x[bk,128]       (2x MACs, no zeros,
                  VPU add/sub epilogue recovers both heads)
  D. transposed:  two dots [64,bq]x[bq,bk]        (SAME MACs as A; the 64
                  lands on output SUBLANES, lanes are full bk — the
                  orientation a fully-transposed flash kernel would use)

If D wins, the flash kernels should be re-plumbed in [d, S] orientation
(dv^T = do^T@p etc); if only B/C win (>=2x rate at 2x MACs), pair-packing
wins; if none beat A by >10%, the round-2 "no win available" conclusion
stands and the d=64 ceiling is confirmed structural.

Run on TPU: PYTHONPATH=.:/root/.axon_site python scripts/exp_pallas_n64.py
Env: EN_BQ (512), EN_BK (1024), EN_PAIRS (40 grid steps), EN_REPS (30).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BQ = int(os.environ.get("EN_BQ", "512"))
# Inner repeats per grid step: the operands stream from HBM once and the
# dots run R times over the VMEM-resident tiles, so the measurement is
# MXU-rate-bound like the real flash kernel (where p is computed in VMEM),
# not HBM-bound (first cut of this experiment measured pure bandwidth:
# every variant ~1.7 ms at PAIRS=160 regardless of matmul shape).
R = int(os.environ.get("EN_INNER", "8"))
BK = int(os.environ.get("EN_BK", "1024"))
PAIRS = int(os.environ.get("EN_PAIRS", "40"))
REPS = int(os.environ.get("EN_REPS", "30"))
D = 64


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def dot(a, b, acc=jnp.float32):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )

    # ---- kernels (each grid step = one pair of heads) ---------------------
    def kern_a(p1, p2, v1, v2, o1, o2):
        acc1 = dot(p1[...], v1[...])
        acc2 = dot(p2[...], v2[...])
        for _ in range(R - 1):
            acc1 += dot(p1[...], v1[...])
            acc2 += dot(p2[...], v2[...])
        o1[...] = (acc1 / R).astype(o1.dtype)
        o2[...] = (acc2 / R).astype(o2.dtype)

    def kern_b(pcat, vbd, o):
        acc = dot(pcat[...], vbd[...])
        for _ in range(R - 1):
            acc += dot(pcat[...], vbd[...])
        o[...] = (acc / R).astype(o.dtype)

    def kern_c(p_sum, p_diff, vcat, vneg, o):
        acc = dot(p_sum[...], vcat[...]) + dot(p_diff[...], vneg[...])
        for _ in range(R - 1):
            acc += dot(p_sum[...], vcat[...]) + dot(p_diff[...], vneg[...])
        o[...] = (0.5 * acc / R).astype(o.dtype)

    def kern_d(dt1, dt2, p1, p2, o1, o2):
        # transposed orientation: [64, bq] x [bq, bk] -> [64, bk]
        acc1 = dot(dt1[...], p1[...])
        acc2 = dot(dt2[...], p2[...])
        for _ in range(R - 1):
            acc1 += dot(dt1[...], p1[...])
            acc2 += dot(dt2[...], p2[...])
        o1[...] = (acc1 / R).astype(o1.dtype)
        o2[...] = (acc2 / R).astype(o2.dtype)

    def kern_e(do1, do2, p1, p2, o1, o2):
        # SURGICAL variant: same untransposed operands as the real bwd
        # (p scores [bq,bk], do cotangent [bq,64]), but the dot contracts
        # lhs dim0 with rhs dim0 (A^T @ B) so the output dv^T = do^T @ p is
        # [64, bk] — d on SUBLANES, bk on full lanes — with zero
        # materialized transposes in VMEM. Same MACs as the dv it replaces.
        def dott(a, b):
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc1 = dott(do1[...], p1[...])
        acc2 = dott(do2[...], p2[...])
        for _ in range(R - 1):
            acc1 += dott(do1[...], p1[...])
            acc2 += dott(do2[...], p2[...])
        o1[...] = (acc1 / R).astype(o1.dtype)
        o2[...] = (acc2 / R).astype(o2.dtype)

    def make_call(kern, in_shapes, out_shapes):
        def body(*refs):
            n_in = len(in_shapes)
            outs = refs[n_in:]

            class _W:
                def __init__(self, ref):
                    self._r = ref

                def __getitem__(self, _):
                    return self._r[0]

                def __setitem__(self, _, v):
                    self._r[0] = v

                @property
                def dtype(self):
                    return self._r.dtype

            kern(*[_W(r) for r in refs[:n_in]], *[_W(r) for r in outs])

        return pl.pallas_call(
            body,
            grid=(PAIRS,),
            in_specs=[
                pl.BlockSpec((1,) + s, lambda i: (i,) + (0,) * len(s))
                for s in in_shapes
            ],
            out_specs=[
                pl.BlockSpec((1,) + s, lambda i: (i,) + (0,) * len(s))
                for s in out_shapes
            ],
            out_shape=[
                jax.ShapeDtypeStruct((PAIRS,) + s, jnp.bfloat16)
                for s in out_shapes
            ],
        )

    # generate on-device (host->device of multi-100MB operands would
    # crawl over the remote tunnel)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    p1 = jax.random.normal(ks[0], (PAIRS, BQ, BK), jnp.bfloat16)
    p2 = jax.random.normal(ks[1], (PAIRS, BQ, BK), jnp.bfloat16)
    v1 = jax.random.normal(ks[2], (PAIRS, BK, D), jnp.bfloat16)
    v2 = jax.random.normal(ks[3], (PAIRS, BK, D), jnp.bfloat16)

    pcat = jnp.concatenate([p1, p2], axis=2)
    zeros = jnp.zeros((PAIRS, BK, D), jnp.bfloat16)
    vbd = jnp.concatenate(
        [jnp.concatenate([v1, zeros], 2), jnp.concatenate([zeros, v2], 2)], 1
    )
    p_sum = (p1.astype(jnp.float32) + p2.astype(jnp.float32)).astype(jnp.bfloat16)
    p_diff = (p1.astype(jnp.float32) - p2.astype(jnp.float32)).astype(jnp.bfloat16)
    vcat = jnp.concatenate([v1, v2], 2)
    vneg = jnp.concatenate([v1, -v2], 2)
    # D computes o^T = v^T @ p^T... we measure the SHAPE class with
    # equivalent operands: [64, bq] x [bq, bk]. Use v-transposed-like lhs
    # paired against p-transposed; numerics checked against A's transpose.
    p1t = jnp.transpose(p1, (0, 2, 1))  # [P, BK, BQ]
    p2t = jnp.transpose(p2, (0, 2, 1))
    v1t = jnp.transpose(v1, (0, 2, 1))  # [P, 64, BK]
    v2t = jnp.transpose(v2, (0, 2, 1))

    call_a = make_call(kern_a, [(BQ, BK)] * 2 + [(BK, D)] * 2, [(BQ, D)] * 2)
    call_b = make_call(kern_b, [(BQ, 2 * BK), (2 * BK, 2 * D)], [(BQ, 2 * D)])
    call_c = make_call(
        kern_c, [(BQ, BK)] * 2 + [(BK, 2 * D)] * 2, [(BQ, 2 * D)]
    )
    # o^T[64, bq] = v^T[64, bk] @ p^T[bk, bq]
    call_d = make_call(
        kern_d, [(D, BK)] * 2 + [(BK, BQ)] * 2, [(D, BQ)] * 2
    )
    kd = jax.random.split(jax.random.PRNGKey(1), 2)
    do1 = jax.random.normal(kd[0], (PAIRS, BQ, D), jnp.bfloat16)
    do2 = jax.random.normal(kd[1], (PAIRS, BQ, D), jnp.bfloat16)
    call_e = make_call(
        kern_e, [(BQ, D)] * 2 + [(BQ, BK)] * 2, [(D, BK)] * 2
    )

    def sync(out):
        # block_until_ready is a no-op on the remote-tunnel backend
        # (PERF.md); fetching a scalar forces the queued chain to finish.
        return float(jnp.sum(jax.tree.leaves(out)[0][0, :8, :8].astype(jnp.float32)))

    def bench(tag, fn, *args):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        outs = [fn(*args) for _ in range(REPS)]
        sync(outs[-1])
        ms = (time.time() - t0) / REPS * 1e3
        print(json.dumps({"variant": tag, "ms_per_call": round(ms, 3)}), flush=True)
        return ms, out

    t_a, o_a = bench("A baseline 2x[bq,bk]x[bk,64]", call_a, p1, p2, v1, v2)
    t_b, o_b = bench("B blockdiag [bq,2bk]x[2bk,128]", call_b, pcat, vbd)
    t_c, o_c = bench("C sumdiff 2x[bq,bk]x[bk,128]", call_c, p_sum, p_diff, vcat, vneg)
    t_d, o_d = bench("D transposed 2x[64,bk]x[bk,bq]", call_d, v1t, v2t, p1t, p2t)
    t_e, o_e = bench(
        "E dot_general AtB 2x[bq,64]^Tx[bq,bk]", call_e, do1, do2, p1, p2
    )

    # correctness on the first pair only (full-operand D2H over the
    # tunnel would dwarf the measurement)
    ref1 = np.asarray(o_a[0][:1], np.float32)
    ref2 = np.asarray(o_a[1][:1], np.float32)
    scale = np.abs(ref1).max()
    errs = {
        "B": max(
            np.abs(np.asarray(o_b[0][:1], np.float32)[..., :D] - ref1).max(),
            np.abs(np.asarray(o_b[0][:1], np.float32)[..., D:] - ref2).max(),
        ),
        "C": max(
            np.abs(np.asarray(o_c[0][:1], np.float32)[..., :D] - ref1).max(),
            np.abs(np.asarray(o_c[0][:1], np.float32)[..., D:] - ref2).max(),
        ),
        "D": max(
            np.abs(
                np.asarray(o_d[0][:1], np.float32).transpose(0, 2, 1) - ref1
            ).max(),
            np.abs(
                np.asarray(o_d[1][:1], np.float32).transpose(0, 2, 1) - ref2
            ).max(),
        ),
    }
    # E computes dv^T = do^T @ p; reference via einsum
    ref_e1 = np.einsum(
        "pqd,pqk->pdk",
        np.asarray(do1[:1], np.float32),
        np.asarray(p1[:1], np.float32),
    )
    errs["E"] = np.abs(np.asarray(o_e[0][:1], np.float32) - ref_e1).max()
    e_scale = np.abs(ref_e1).max()
    best = min(("B", t_b), ("C", t_c), ("D", t_d), ("E", t_e), key=lambda x: x[1])
    print(
        json.dumps(
            {
                "speedup_vs_A": {
                    "B": round(t_a / t_b, 3),
                    "C": round(t_a / t_c, 3),
                    "D": round(t_a / t_d, 3),
                    "E": round(t_a / t_e, 3),
                },
                "rel_err": {
                    k: float(v / (e_scale if k == "E" else scale))
                    for k, v in errs.items()
                },
                "verdict": f"{best[0]} wins {t_a/best[1]:.2f}x — integrate"
                if best[1] < 0.9 * t_a
                else "break-even/loss — d=64 ceiling confirmed structural",
            }
        )
    )


if __name__ == "__main__":
    main()
