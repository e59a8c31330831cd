"""Is an N=64-output MXU contraction worse than 2x an N=128 one? (Pallas)

The flash backward's three output matmuls (dv = p^T@do, dk = ds^T@q,
dq = ds@k) all have head_dim=64 as the output minor (lane) dimension.
The round-2 XLA bmm probes (PERF.md) measured [S,S]x[S,64] at 0.571 ms vs
[S,S]x[S,128] at 0.357 ms — N=64 is 1.6x SLOWER in absolute time than
N=128 despite half the MACs (3.2x per FLOP). If that penalty holds inside
Mosaic kernels, packing two heads' outputs side by side with a
block-diagonal second operand (2x the MACs, all at the N=128 rate) wins
~1.6x on those matmuls; if Mosaic's penalty is exactly 2x (lane padding
only), packing is break-even and the round-2 "no win" conclusion stands.

This measures exactly that, inside Pallas kernels with realistic flash-bwd
tile shapes (block_q=512, block_k=1024, d=64):

  A. baseline:   two separate dots  [512,1024]x[1024,64]   (per head)
  B. block-diag: one dot            [512,2048]x[2048,128]  (pair-packed)
  C. sum/diff:   two dots           [512,1024]x[1024,128]  (no zeros;
     recovers both heads with a VPU add/sub epilogue)

Grid iterates over batch*pairs; each variant does the same useful work
(two heads' worth of PV/dv-style contractions per grid step).

Run on TPU: PYTHONPATH=.:/root/.axon_site python scripts/exp_pallas_n64.py
Env: EN_BQ (512), EN_BK (1024), EN_PAIRS (40 grid steps), EN_REPS (50).
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

BQ = int(os.environ.get("EN_BQ", "512"))
BK = int(os.environ.get("EN_BK", "1024"))
PAIRS = int(os.environ.get("EN_PAIRS", "40"))
REPS = int(os.environ.get("EN_REPS", "50"))
D = 64


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # ---- kernels ---------------------------------------------------------
    def kern_baseline(p1_ref, p2_ref, v1_ref, v2_ref, o1_ref, o2_ref):
        o1_ref[...] = jax.lax.dot_general(
            p1_ref[...], v1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o1_ref.dtype)
        o2_ref[...] = jax.lax.dot_general(
            p2_ref[...], v2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o2_ref.dtype)

    def kern_blockdiag(pcat_ref, vbd_ref, o_ref):
        # pcat [BQ, 2BK], vbd [2BK, 128] block-diagonal
        o_ref[...] = jax.lax.dot_general(
            pcat_ref[...], vbd_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def kern_sumdiff(p_sum_ref, p_diff_ref, vcat_ref, vneg_ref, o_ref):
        # o = 0.5*((p1+p2)@[v1|v2] + (p1-p2)@[v1|-v2]) = [p1@v1 | p2@v2]
        a = jax.lax.dot_general(
            p_sum_ref[...], vcat_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        b = jax.lax.dot_general(
            p_diff_ref[...], vneg_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = (0.5 * (a + b)).astype(o_ref.dtype)

    def make_call(kern, in_shapes, out_shapes):
        grid = (PAIRS,)
        in_specs = [
            pl.BlockSpec(s, lambda i: (i,) + (0,) * (len(s) - 1))
            for s in [(1,) + s for s in in_shapes]
        ]
        out_specs = [
            pl.BlockSpec(s, lambda i: (i,) + (0,) * (len(s) - 1))
            for s in [(1,) + s for s in out_shapes]
        ]

        def squeeze_kern(*refs):
            class _V:
                def __init__(self, ref):
                    self.ref = ref

                def __getitem__(self, idx):
                    return self.ref[0]

                @property
                def dtype(self):
                    return self.ref.dtype

                def __setitem__(self, idx, val):
                    self.ref[0] = val

            kern(*[_V(r) for r in refs])

        n_out = len(out_shapes)
        return pl.pallas_call(
            squeeze_kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs if n_out > 1 else out_specs[0],
            out_shape=[
                jax.ShapeDtypeStruct((PAIRS,) + s, jnp.bfloat16)
                for s in out_shapes
            ]
            if n_out > 1
            else jax.ShapeDtypeStruct((PAIRS,) + out_shapes[0], jnp.bfloat16),
        )

    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.standard_normal((PAIRS, BQ, BK)), jnp.bfloat16)
    p2 = jnp.asarray(rng.standard_normal((PAIRS, BQ, BK)), jnp.bfloat16)
    v1 = jnp.asarray(rng.standard_normal((PAIRS, BK, D)), jnp.bfloat16)
    v2 = jnp.asarray(rng.standard_normal((PAIRS, BK, D)), jnp.bfloat16)

    # prepacked operands (packing itself rides the kernels that produce
    # p/v in a real integration; measured separately below)
    pcat = jnp.concatenate([p1, p2], axis=2)  # [P, BQ, 2BK]
    zeros = jnp.zeros((PAIRS, BK, D), jnp.bfloat16)
    vbd = jnp.concatenate(
        [
            jnp.concatenate([v1, zeros], axis=2),
            jnp.concatenate([zeros, v2], axis=2),
        ],
        axis=1,
    )  # [P, 2BK, 128]
    p_sum = (p1.astype(jnp.float32) + p2.astype(jnp.float32)).astype(jnp.bfloat16)
    p_diff = (p1.astype(jnp.float32) - p2.astype(jnp.float32)).astype(jnp.bfloat16)
    vcat = jnp.concatenate([v1, v2], axis=2)  # [P, BK, 128]
    vneg = jnp.concatenate([v1, -v2], axis=2)

    base = make_call(
        kern_baseline,
        [(BQ, BK), (BQ, BK), (BK, D), (BK, D)],
        [(BQ, D), (BQ, D)],
    )
    bdiag = make_call(kern_blockdiag, [(BQ, 2 * BK), (2 * BK, 2 * D)], [(BQ, 2 * D)])
    sdiff = make_call(
        kern_sumdiff,
        [(BQ, BK), (BQ, BK), (BK, 2 * D), (BK, 2 * D)],
        [(BQ, 2 * D)],
    )

    def bench(tag, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        # chained timing is awkward across shapes; use many reps + one sync
        t0 = time.time()
        outs = []
        for _ in range(REPS):
            outs.append(fn(*args))
        jax.block_until_ready(outs)
        ms = (time.time() - t0) / REPS * 1e3
        print(json.dumps({"variant": tag, "ms_per_call": round(ms, 3)}), flush=True)
        return ms, out

    t_base, o_base = bench("A baseline 2x[BQ,BK]x[BK,64]", base, p1, p2, v1, v2)
    t_bd, o_bd = bench("B blockdiag [BQ,2BK]x[2BK,128]", bdiag, pcat, vbd)
    t_sd, o_sd = bench("C sumdiff 2x[BQ,BK]x[BK,128]", sdiff, p_sum, p_diff, vcat, vneg)

    # correctness
    ref1 = np.asarray(o_base[0], np.float32)
    ref2 = np.asarray(o_base[1], np.float32)
    got_bd = np.asarray(o_bd, np.float32)
    got_sd = np.asarray(o_sd, np.float32)
    err_bd = max(
        np.abs(got_bd[..., :D] - ref1).max(), np.abs(got_bd[..., D:] - ref2).max()
    )
    err_sd = max(
        np.abs(got_sd[..., :D] - ref1).max(), np.abs(got_sd[..., D:] - ref2).max()
    )
    scale = np.abs(ref1).max()
    print(
        json.dumps(
            {
                "speedup_blockdiag": round(t_base / t_bd, 3),
                "speedup_sumdiff": round(t_base / t_sd, 3),
                "err_blockdiag_rel": float(err_bd / scale),
                "err_sumdiff_rel": float(err_sd / scale),
                "verdict": "PACKING WINS — integrate into flash bwd"
                if min(t_bd, t_sd) < 0.9 * t_base
                else "break-even/loss — round-2 conclusion stands",
            }
        )
    )


if __name__ == "__main__":
    main()
