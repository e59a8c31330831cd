"""Fused flash attention for TPU (Pallas/Mosaic), forward + backward.

The UNet's self-attention over S = H·W image tokens (≈6.9k at processing
resolution 768) is the FLOP- and bandwidth-dominant op of the sampling loop;
XLA materializes the [S,S] score matrix in HBM (~190 MB fp32 per head at
S=6912) in both directions. This kernel tiles the online-softmax computation
(flash attention) so scores only ever exist as a [block_q, block_k] VMEM
tile, for the forward pass and the backward pass (default: a fused one-pass
kernel accumulating dk/dv in scratch while emitting per-KV-block dq
partials; a classic two-kernel dq/dkv backward remains behind FUSED_BWD).

Scope (what the UNet needs, nothing more): non-causal self/cross attention,
fp32 softmax statistics, no bias/segment masking; ragged sequence lengths
are handled by padding to the block size and masking padded KV columns.
Layout: [BH, S, D] with batch·heads flattened into the leading grid axis.

Extensibility note (SURVEY.md §5 long-context): the q/k/v interface is the
slot for a ring/blockwise variant — a no-downsample native-resolution mode
would shard S over the mesh and rotate KV blocks with
``pltpu.make_async_remote_copy`` between the same online-softmax updates.
Not a parity requirement; the hook is the ``attention_fn`` argument of
``apply_unet``.

Backward math (standard flash bwd, exp2 domain):
    p  = exp2(s·log2e − m̂)      (m̂ = m + log2 l, the single saved row stat)
    dv = pᵀ @ do
    dp = do @ vᵀ
    ds = p ⊙ (dp − di),  di = rowsum(do ⊙ o)   (recomputed per block from o)
    dk = dsᵀ @ q · scale
    dq = Σ_kv ds @ k · scale     (bf16 per-KV-block partials, f32 reduce)

Falls back to `models.layers.attention` (XLA) when Pallas/TPU is not
available or shapes are tiny (cross-attention with S_kv=2 is a plain matmul).

A/B knobs (DCT_EXP_DOMAIN, DCT_DQ_PARTIALS, DCT_FWD_STREAMS,
DCT_BWD_STREAMS, DCT_MASK_TAIL, DCT_FLASH_BLOCKS) are read ONCE, at module
import — setting them afterwards (in a test or notebook) silently does
nothing. Set them in the process environment before importing the package,
or reassign the module-level constants directly for in-process experiments.
DCT_FLASH_BLOCKS is parse-validated at import (4 positive ints).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128
# Softmax runs in the exp2 domain: log2(e) folds into the (static) score
# scale once, so the VPU evaluates native exp2 instead of exp's extra
# per-element multiply, on every [block_q, block_k] tile. The saved row
# maxima (m) are therefore log2-domain — a private contract between the
# paired fwd/bwd kernels (residuals never leave the custom_vjp).
# DCT_EXP_DOMAIN=exp lets full-program A/Bs fall back to the natural-exp
# softmax (scores unscaled by log2e, stats in ln-domain).
EXP2_DOMAIN = os.environ.get("DCT_EXP_DOMAIN", "exp2") == "exp2"
_LOG2E = 1.4426950408889634 if EXP2_DOMAIN else 1.0
_exp = jnp.exp2 if EXP2_DOMAIN else jnp.exp
_log = jnp.log2 if EXP2_DOMAIN else jnp.log

# Test hook: run kernels in the Pallas interpreter (CPU) instead of Mosaic.
INTERPRET = False

# One-pass backward (dq partials emitted alongside dk/dv) vs the classic
# two-kernel flash backward. The fused path computes the score matrix and
# dp once instead of twice.
FUSED_BWD = True

# dtype of the fused backward's per-KV-block dq partials. They are pure HBM
# round-trip (written by the kernel, summed in f32 right after): bf16 halves
# that traffic (~128 MB/step at smoke geometry) at ~0.4% relative noise on
# dq — the same precision class as the bf16 dk/dv outputs.
# Overridable via DCT_DQ_PARTIALS=f32|bf16 for full-program A/Bs.
DQ_PARTIALS_DTYPE = (
    jnp.float32
    if os.environ.get("DCT_DQ_PARTIALS", "bf16") == "f32"
    else jnp.bfloat16
)

# Independent q-block streams per forward kernel body. The body's dataflow
# (QK dot → online softmax → PV dot) is a strict MXU→VPU→MXU dependency
# chain; with 2 streams the body carries two such chains over disjoint
# q rows, giving Mosaic's scheduler freedom to overlap one stream's VPU
# softmax with the other's MXU dots. Exact (each stream is the same math
# on its rows). Applied when the padded sequence divides 2·block_q;
# measured via scripts/exp_flash_overlap.py / exp_flash_twostream.py and
# trace-verified on v5e (scripts/exp_streams_trace.py: fwd 1.84→1.77 ms,
# bwd 2.70→2.63 ms per stage-0 call, bit-identical outputs).
# Overridable via DCT_FWD_STREAMS / DCT_BWD_STREAMS for full-program A/Bs.
FWD_STREAMS = int(os.environ.get("DCT_FWD_STREAMS", "2"))

# Same idea for the fused backward body (two independent q-row streams per
# instance; only the dk/dv scratch accumulate serializes between them).
# VMEM: two streams hold two score/p/ds/dp tile sets; verified to fit on
# v5e at the shipped (512,1024) blocks for BOTH production geometries —
# UNet stage-0 (d=64) and the KL VAE mid-attention (heads=1, d=512;
# scripts/exp_vae_flash_vmem.py sweep 2026-08-19, all configs compile,
# streams=2 fastest at 55.3 ms/call fwd+bwd, S=6912).
BWD_STREAMS = int(os.environ.get("DCT_BWD_STREAMS", "2"))

# Transposed d-outputs in the fused backward: dk/dv/dq computed as [d, S]
# (head_dim on sublanes, full 128-lane outputs) instead of [S, d] whose
# 64-lane outputs run below the MXU's full-width rate (PERF.md round-2
# shape probes; scripts/exp_pallas_n64.py measures the kernel-level
# delta). Same math, swapped dot_general operand orders; one XLA swapaxes
# per output per call. DEFAULT ON since the round-4 full-program A/B:
# 0.5079 vs 0.4675 f/s/chip at batch 8 (device step 314.42 vs 341.67 ms)
# and 0.4479 vs 0.4174 at batch 1 — PERF.md round-4. DCT_BWD_TRANSPOSED=0
# restores the [S, d] orientation.
BWD_TRANSPOSED = os.environ.get("DCT_BWD_TRANSPOSED", "1") == "1"

# Transposed FORWARD: scores computed [block_k, block_q] (q rows on lanes)
# so the PV matmul emits o^T [d, block_q] — full-lane output like the
# transposed backward — and the softmax row stats become lane vectors
# ([1, rows]; the intra-vreg finish is 3 sublane rotations instead of 7
# lane rotations). Same math; o/m̂ are converted back to the baseline
# layouts ([BH, S, d] / lane-replicated [BH, S, LANES]) by XLA once per
# call, so the backward and the ring path are untouched. A/B via
# DCT_FWD_TRANSPOSED.
FWD_TRANSPOSED = os.environ.get("DCT_FWD_TRANSPOSED", "0") == "1"


def _next_multiple(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

# Tail-masking strategy: "always" masks every block unconditionally;
# "cond" gates the iota+compare+select behind a per-block lax.cond.
# "cond" looked cheaper on paper (skips 3 VPU passes on bulk blocks) but a
# branch in the kernel body defeats Mosaic's scheduling/pipelining and cost
# ~9 ms/step at full-program level — the root cause of the BENCH_r02
# regression (PERF.md round-3: 0.336 → 0.417 f/s from this one default).
# Overridable via DCT_MASK_TAIL for A/Bs.
MASK_STRATEGY = os.environ.get("DCT_MASK_TAIL", "always")


def _mask_tail(s, ki, block_k, kv_len, mask_tail):
    """Mask padded KV columns (skipped entirely for block-aligned
    sequences, ``mask_tail=False``, static)."""
    if not mask_tail:
        return s

    def masked(x):
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + ki * block_k
        return jnp.where(col < kv_len, x, MASK_VALUE)

    if MASK_STRATEGY == "always":
        return masked(s)
    return jax.lax.cond((ki + 1) * block_k > kv_len, masked, lambda x: x, s)


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, mhat_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale: float, kv_len: int, block_k: int, num_kv_blocks: int,
    mask_tail: bool, block_q: int, streams: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    k = k_ref[0]  # [block_k, d]
    v = v_ref[0]  # [block_k, d]
    d_acc = acc_scr.shape[-1]
    for h in range(streams):  # independent row streams (see FWD_STREAMS)
        rows = slice(h * block_q, (h + 1) * block_q)
        q = q_ref[0][rows]  # [block_q, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        s = s * (sm_scale * _LOG2E)  # log2-domain scores

        s = _mask_tail(s, ki, block_k, kv_len, mask_tail)

        m_prev = m_scr[rows]  # [block_q, LANES]
        l_prev = l_scr[rows]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast → [block_q, LANES]
        alpha = _exp(m_prev - m_next)
        p = _exp(s - m_next[:, :1])  # [block_q, block_k]
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1, keepdims=True)

        m_scr[rows] = m_next
        l_scr[rows] = l_next

        o_curr = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # [block_q, d]
        # alpha is lane-replicated [block_q, LANES]; slice to d lanes when
        # d ≤ LANES, lane-broadcast from one column when d > LANES (the
        # KL VAE's single-head d=512 geometry).
        alpha_d = alpha[:, :d_acc] if d_acc <= _LANES else alpha[:, :1]
        acc_scr[rows] = acc_scr[rows] * alpha_d + o_curr

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l_final = l_scr[...]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        d_out = acc_scr.shape[-1]
        l_inv_d = l_inv[:, :d_out] if d_out <= _LANES else l_inv[:, :1]
        o_ref[0] = (acc_scr[...] * l_inv_d).astype(o_ref.dtype)
        # The backward recomputes p as exp2(s − m − log2 l); fold the two
        # row stats into the single residual m̂ = m + log2(l) here, where
        # both live in VMEM — one stats tensor to HBM instead of two, and
        # the bwd kernels re-read row stats once per KV block.
        mhat_ref[0] = m_scr[...] + jnp.where(
            l_final == 0.0, 0.0, _log(l_final)
        )


def _mask_tail_rows(s, ki, block_k, kv_len, mask_tail):
    """Transposed-score variant of _mask_tail: KV runs along axis 0."""
    if not mask_tail:
        return s

    def masked(x):
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + ki * block_k
        return jnp.where(row < kv_len, x, MASK_VALUE)

    if MASK_STRATEGY == "always":
        return masked(s)
    return jax.lax.cond((ki + 1) * block_k > kv_len, masked, lambda x: x, s)


def _fwd_kernel_t(
    q_ref, k_ref, v_ref, o_ref, mhat_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale: float, kv_len: int, block_k: int, num_kv_blocks: int,
    mask_tail: bool, block_q: int, streams: int,
):
    """Transposed-score forward (see FWD_TRANSPOSED).

    Scores are built [block_k, block_q] via k·qᵀ, so the PV contraction
    emits o^T = vᵀ·p with shape [d, block_q] — head_dim lands on sublanes
    and the long q axis fills all 128 output lanes (the same orientation
    fix as _bwd_fused_kernel_t). Softmax row stats live as [1, rows] lane
    vectors; the online update math is identical to _fwd_kernel.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    k = k_ref[0]  # [block_k, d]
    v = v_ref[0]  # [block_k, d]
    for h in range(streams):
        cols = slice(h * block_q, (h + 1) * block_q)
        q = q_ref[0][cols]  # [block_q, d]
        s = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_k, block_q] — q rows on LANES
        s = s * (sm_scale * _LOG2E)
        s = _mask_tail_rows(s, ki, block_k, kv_len, mask_tail)

        m_prev = m_scr[:, cols]  # [1, block_q]
        l_prev = l_scr[:, cols]
        m_curr = jnp.max(s, axis=0, keepdims=True)  # [1, block_q]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = _exp(m_prev - m_next)  # [1, block_q]
        p = _exp(s - m_next)  # [block_k, block_q]
        l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
        m_scr[:, cols] = m_next
        l_scr[:, cols] = l_next

        o_curr = jax.lax.dot_general(
            v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [d, block_q]
        acc_scr[:, cols] = acc_scr[:, cols] * alpha + o_curr

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        l_final = l_scr[...]  # [1, rows]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)  # [d, rows]
        mhat_row = m_scr[...] + jnp.where(
            l_final == 0.0, 0.0, _log(l_final)
        )  # [1, rows]
        mhat_ref[0] = jnp.broadcast_to(mhat_row, mhat_ref.shape[1:])


def _fwd_t(q, k, v, sm_scale, block_q, block_k, kv_len):
    """FWD_TRANSPOSED path: same contract as _fwd — (o [BH,Sq,D],
    m̂ lane-replicated [BH,Sq,LANES]) — with the transposed kernel inside
    and one XLA swapaxes per output to restore the baseline layouts."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    streams = FWD_STREAMS if sq % (FWD_STREAMS * block_q) == 0 else 1
    rows = streams * block_q
    grid = (bh, sq // rows, sk // block_k)
    stat_sub = 8  # minimum f32 sublane tile for the m̂ output
    kernel = functools.partial(
        _fwd_kernel_t,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_k=block_k,
        num_kv_blocks=sk // block_k,
        mask_tail=sk != kv_len,
        block_q=block_q,
        streams=streams,
    )
    o_t, mhat_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, rows), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, stat_sub, rows), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, sq), q.dtype),
            jax.ShapeDtypeStruct((bh, stat_sub, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, rows), jnp.float32),
            pltpu.VMEM((1, rows), jnp.float32),
            pltpu.VMEM((d, rows), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    o = jnp.swapaxes(o_t, 1, 2)
    mhat = jnp.broadcast_to(
        jnp.swapaxes(mhat_t[:, :1], 1, 2), (bh, sq, _LANES)
    )
    return o, mhat


def _fwd(q, k, v, sm_scale, block_q, block_k, kv_len):
    """q [BH, Sq, D], k/v [BH, Sk, D] (padded) → (o, m̂=m+log2 l)."""
    if FWD_TRANSPOSED:
        return _fwd_t(q, k, v, sm_scale, block_q, block_k, kv_len)
    bh, sq, d = q.shape
    sk = k.shape[1]
    streams = FWD_STREAMS if sq % (FWD_STREAMS * block_q) == 0 else 1
    rows = streams * block_q
    grid = (bh, sq // rows, sk // block_k)
    kernel = functools.partial(
        _fwd_kernel,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_k=block_k,
        num_kv_blocks=sk // block_k,
        mask_tail=sk != kv_len,
        block_q=block_q,
        streams=streams,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, rows, _LANES), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, _LANES), jnp.float32),
            pltpu.VMEM((rows, _LANES), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, mhat_ref, o_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, sm_scale: float, kv_len: int, block_k: int, num_q_blocks: int,
    mask_tail: bool,
):
    qi = pl.program_id(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # [block_q, d]
    k = k_ref[0]  # [block_k, d]
    v = v_ref[0]
    do = do_ref[0]  # [block_q, d]
    mhat = mhat_ref[0][:, :1]  # [block_q, 1], m + log2(l) from the fwd
    # di = rowsum(do * o), recomputed per visit from the [block_q, d] o
    # block instead of streaming a precomputed lane-replicated f32 tensor
    # (4x the bytes of o) through HBM once per KV block.
    di = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=-1,
        keepdims=True,
    )

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (sm_scale * _LOG2E)
    s = _mask_tail(s, ki, block_k, kv_len, mask_tail)
    # p = exp2(s − m̂) — the 1/l normalizer is folded into m̂ by the fwd:
    # one exp2, no extra full-tile multiply (log2-domain fwd contract).
    p = _exp(s - mhat)  # [block_q, block_k]

    # dv += p^T @ do
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp = do @ v^T ; ds = p * (dp - di)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di)  # [block_q, block_k]
    # dk += ds^T @ q * scale
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)



def _bwd_fused_kernel(
    q_ref, k_ref, v_ref, do_ref, mhat_ref, o_ref,
    dk_ref, dv_ref, dqp_ref, dk_scr, dv_scr,
    *, sm_scale: float, kv_len: int, block_k: int, num_q_blocks: int,
    mask_tail: bool, block_q: int, streams: int,
):
    """One-pass backward: accumulates dk/dv in scratch and emits per-KV-block
    dq partials (summed outside the kernel). Avoids the second full
    recomputation of the score matrix that a separate dq kernel needs.

    With ``streams=2`` the body processes two q-row streams (see
    BWD_STREAMS): their score/p/ds chains are independent — only the dk/dv
    scratch accumulate serializes between them, in the same qi order as
    separate grid steps, so results are bit-equal."""
    qi = pl.program_id(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k = k_ref[0]  # [block_k, d]
    v = v_ref[0]
    for h in range(streams):
        rows = slice(h * block_q, (h + 1) * block_q)
        q = q_ref[0][rows]  # [block_q, d]
        do = do_ref[0][rows]  # [block_q, d]
        mhat = mhat_ref[0][rows, :1]  # [block_q, 1], m + log2(l) from fwd
        # di = rowsum(do * o), recomputed per visit from the [block_q, d] o
        # block instead of streaming a precomputed lane-replicated f32
        # tensor (4x the bytes of o) through HBM once per KV block.
        di = jnp.sum(
            do.astype(jnp.float32) * o_ref[0][rows].astype(jnp.float32),
            axis=-1,
            keepdims=True,
        )

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * _LOG2E)
        s = _mask_tail(s, ki, block_k, kv_len, mask_tail)
        # p = exp2(s − m̂) — the 1/l normalizer is folded into m̂ by the
        # fwd: one exp2, no extra full-tile multiply (log2-domain contract).
        p = _exp(s - mhat)  # [block_q, block_k]

        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di)  # [block_q, block_k]
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        # dq partial for this KV block (reduced over ki outside the kernel)
        dqp_ref[0, 0, rows] = (
            jax.lax.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
            * sm_scale
        ).astype(dqp_ref.dtype)

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_fused_kernel_t(
    q_ref, k_ref, v_ref, do_ref, mhat_ref, o_ref,
    dk_ref, dv_ref, dqp_ref, dk_scr, dv_scr,
    *, sm_scale: float, kv_len: int, block_k: int, num_q_blocks: int,
    mask_tail: bool, block_q: int, streams: int,
):
    """Fused backward with TRANSPOSED d-outputs (dk/dv/dq as [d, S]).

    Identical math to ``_bwd_fused_kernel``; the three output matmuls use
    swapped dot_general operand orders so head_dim=64 lands on output
    SUBLANES and the long S axis fills all 128 lanes:

        dv^T += do^T @ p          [d, block_k]
        dk^T += q^T @ ds · scale  [d, block_k]
        dq^T  = k^T @ ds^T · scale [d, block_q]  (per-KV-block partial)

    An N=64-lane output runs ~3.2x below the MXU's N=128 rate (PERF.md
    round-2 shape probes); the transposed orientation does the same MACs at
    full lane width with zero materialized transposes in VMEM (the operand
    swap is a dot_general dimension-numbers change). The [BH, d, S] outputs
    are swapped back to [BH, S, d] by XLA once per call. Kernel-level
    probes in scripts/exp_pallas_n64.py; full-program A/B made it the
    DEFAULT in round 4 (-8% device step time at batch 8 and 1, PERF.md);
    DCT_BWD_TRANSPOSED=0 restores the [S, d] orientation.
    """
    qi = pl.program_id(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k = k_ref[0]  # [block_k, d]
    v = v_ref[0]
    for h in range(streams):
        rows = slice(h * block_q, (h + 1) * block_q)
        q = q_ref[0][rows]  # [block_q, d]
        do = do_ref[0][rows]  # [block_q, d]
        mhat = mhat_ref[0][rows, :1]
        di = jnp.sum(
            do.astype(jnp.float32) * o_ref[0][rows].astype(jnp.float32),
            axis=-1,
            keepdims=True,
        )

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * _LOG2E)
        s = _mask_tail(s, ki, block_k, kv_len, mask_tail)
        p = _exp(s - mhat)  # [block_q, block_k]

        # dv^T += do^T @ p   → [d, block_k], full 128-lane output
        dv_scr[...] += jax.lax.dot_general(
            do, p.astype(do.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di)  # [block_q, block_k]
        # dk^T += q^T @ ds  → [d, block_k]
        dk_scr[...] += jax.lax.dot_general(
            q, ds.astype(q.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        # dq^T partial = k^T @ ds^T → [d, block_q]
        dqp_ref[0, 0, :, rows] = (
            jax.lax.dot_general(
                k, ds.astype(k.dtype), (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        ).astype(dqp_ref.dtype)

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, mhat_ref, o_ref,
    dq_ref, dq_scr,
    *, sm_scale: float, kv_len: int, block_k: int, num_kv_blocks: int,
    mask_tail: bool,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    mhat = mhat_ref[0][:, :1]  # m + log2(l) from the fwd
    di = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=-1,
        keepdims=True,
    )

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (sm_scale * _LOG2E)
    s = _mask_tail(s, ki, block_k, kv_len, mask_tail)
    p = _exp(s - mhat)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di)
    dq_scr[...] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    ) * sm_scale

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def _flash(q, k, v, sm_scale, block_q, block_k, bwd_block_q, bwd_block_k, kv_len):
    o, _ = _fwd(q, k, v, sm_scale, block_q, block_k, kv_len)
    return o


def _flash_fwd(q, k, v, sm_scale, block_q, block_k, bwd_block_q, bwd_block_k, kv_len):
    o, mhat = _fwd(q, k, v, sm_scale, block_q, block_k, kv_len)
    return o, (q, k, v, o, mhat)


def _fused_bwd_call(q, k, v, do, mhat, o, sm_scale, block_q, block_k, kv_len):
    """One-pass fused backward over padded [BH, S, D] operands →
    (dk, dv, dq). Shared by the custom_vjp below and the ring backward
    (ops/ring_attention.py), where per-visiting-block calls accumulate.

    With BWD_TRANSPOSED the kernel writes d-transposed outputs ([BH, d, S];
    full-lane MXU outputs, see _bwd_fused_kernel_t) which are swapped back
    here — one XLA relayout per tensor per call."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    nk = sk // block_k
    streams = BWD_STREAMS if sq % (BWD_STREAMS * block_q) == 0 else 1
    rows = streams * block_q
    fused = functools.partial(
        _bwd_fused_kernel_t if BWD_TRANSPOSED else _bwd_fused_kernel,
        sm_scale=sm_scale, kv_len=kv_len, block_k=block_k,
        num_q_blocks=sq // rows,
        mask_tail=sk != kv_len, block_q=block_q, streams=streams,
    )
    if BWD_TRANSPOSED:
        out_specs = [
            pl.BlockSpec((1, d, block_k), lambda b, ki, qi: (b, 0, ki)),
            pl.BlockSpec((1, d, block_k), lambda b, ki, qi: (b, 0, ki)),
            pl.BlockSpec((1, 1, d, rows), lambda b, ki, qi: (ki, b, 0, qi)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, d, sk), k.dtype),
            jax.ShapeDtypeStruct((bh, d, sk), v.dtype),
            jax.ShapeDtypeStruct((nk, bh, d, sq), DQ_PARTIALS_DTYPE),
        ]
        scratch = [
            pltpu.VMEM((d, block_k), jnp.float32),
            pltpu.VMEM((d, block_k), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, 1, rows, d), lambda b, ki, qi: (ki, b, qi, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
            jax.ShapeDtypeStruct((nk, bh, sq, d), DQ_PARTIALS_DTYPE),
        ]
        scratch = [
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ]
    dk, dv, dq_partial = pl.pallas_call(
        fused,
        grid=(bh, nk, sq // rows),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, rows, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, rows, _LANES), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, rows, d), lambda b, ki, qi: (b, qi, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, do, mhat, o)
    dq = jnp.sum(dq_partial, axis=0, dtype=jnp.float32).astype(q.dtype)
    if BWD_TRANSPOSED:
        dk = jnp.swapaxes(dk, 1, 2)
        dv = jnp.swapaxes(dv, 1, 2)
        dq = jnp.swapaxes(dq, 1, 2)
    return dk, dv, dq


def _flash_bwd(sm_scale, fwd_block_q, fwd_block_k, block_q, block_k, kv_len, res, do):
    q, k, v, o, mhat = res
    bh, sq, d = q.shape
    sk = k.shape[1]

    nq, nk = sq // block_q, sk // block_k

    if FUSED_BWD:
        dk, dv, dq = _fused_bwd_call(
            q, k, v, do, mhat, o, sm_scale, block_q, block_k, kv_len
        )
        return dq, dk, dv

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        sm_scale=sm_scale, kv_len=kv_len, block_k=block_k, num_q_blocks=nq,
        mask_tail=sk != kv_len,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, do, mhat, o)

    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        sm_scale=sm_scale, kv_len=kv_len, block_k=block_k, num_kv_blocks=nk,
        mask_tail=sk != kv_len,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, do, mhat, o)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public entry: [N, S, C] multi-head interface matching layers.attention
# ---------------------------------------------------------------------------

# Optional global block-shape override ("bq,bk,bbq,bbk") for full-program
# sweeps, e.g. DCT_FLASH_BLOCKS=512,768,512,768 makes S=6912 (= 9*768)
# block-aligned with zero padding. Parse-validated here (exactly four
# positive ints) so a malformed value fails at import with a clear message
# instead of an opaque unpack error at first call.
_BLOCKS_ENV = os.environ.get("DCT_FLASH_BLOCKS", "")
if _BLOCKS_ENV:
    try:
        _BLOCKS_OVERRIDE = tuple(int(x) for x in _BLOCKS_ENV.split(","))
    except ValueError as _exc:
        raise ValueError(
            f"DCT_FLASH_BLOCKS must be 4 comma-separated positive ints "
            f"(bq,bk,bwd_bq,bwd_bk), got {_BLOCKS_ENV!r}"
        ) from _exc
    if len(_BLOCKS_OVERRIDE) != 4 or any(b <= 0 for b in _BLOCKS_OVERRIDE):
        raise ValueError(
            f"DCT_FLASH_BLOCKS must be 4 comma-separated positive ints "
            f"(bq,bk,bwd_bq,bwd_bk), got {_BLOCKS_ENV!r}"
        )
else:
    _BLOCKS_OVERRIDE = None

# Wide KV blocks for narrow heads (d <= 128): the round-5 full-program
# block sweep measured (512, 2304, 512, 2304) at 0.5181 f/s/chip vs
# 0.5080 for the shipped (512, 1024) — +2.0%, stable over repeats.
# Mechanism: 3 KV blocks instead of 7 at the UNet stage-0 S=6912 means
# fewer online-softmax rescale rounds per q tile (the fwd kernel is
# VPU-bound on score-tile passes; PERF.md round-5) and an exactly-tiled
# sequence (6912 = 3*2304: the per-block tail mask — iota+compare+select
# over every score tile — drops out entirely, mask_tail=False).
# SMALLER exact divisors lose (1152: 0.4953, 768: 0.4968 — block size
# dominates mask removal) and 3456 fails to compile (VMEM), so 2304 is
# the sweep's optimum. Gated to d <= _LANES: the KL VAE's single-head
# d=512 k/v tiles at 2304 rows exceed the VMEM budget verified for it
# (scripts/exp_vae_flash_vmem.py swept the (512, 1024) config).
# DCT_FLASH_WIDE_K overrides (0 disables, any int sets the width).
_WIDE_K = int(os.environ.get("DCT_FLASH_WIDE_K", "2304"))


def _choose_kv_blocks(
    sk: int, block_k: int, bwd_block_k: int
) -> tuple[int, int]:
    """Apply the wide-KV default when it does not inflate KV padding.

    ``sk_pad`` rounds to lcm(effective bk, effective bbk); a blind 2304 at
    e.g. the KITTI stage-0 S=2688 would pad to 4608 (+71% KV work per
    call) where the narrow 1024 pads to 3072 — so the wide blocks engage
    only at equal-or-less padding (equal covers exact tilings like
    S=6912 = 3*2304 and the degenerate single-block cases).
    """
    if _WIDE_K <= 0:
        return block_k, bwd_block_k

    def sk_pad_for(ck: int, cbk: int) -> int:
        ebk = min(ck, _next_multiple(sk, _LANES))
        ebbk = min(cbk, _next_multiple(sk, _LANES))
        return _next_multiple(sk, math.lcm(ebk, ebbk))

    if sk_pad_for(_WIDE_K, _WIDE_K) <= sk_pad_for(block_k, bwd_block_k):
        return _WIDE_K, _WIDE_K
    return block_k, bwd_block_k


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    block_q: int = 512,
    block_k: int = 1024,
    bwd_block_q: int = 512,
    bwd_block_k: int = 1024,
    min_seq_len: int = 768,
) -> jnp.ndarray:
    """Drop-in replacement for ``layers.attention`` backed by Pallas.

    Falls back to the XLA path for short sequences (cross-attention over the
    2-token empty-prompt context) where a fused kernel buys nothing.
    """
    from depth_completion_tpu.models.layers import attention as xla_attention

    n, sq, c = q.shape
    sk = k.shape[1]
    if jax.default_backend() != "tpu" and not INTERPRET:
        # Pallas TPU kernels don't run on the CPU backend (interpreter mode
        # is test-only, see tests/test_flash_attention.py).
        return xla_attention(q, k, v, num_heads)
    if sk < min_seq_len or c % num_heads != 0:
        return xla_attention(q, k, v, num_heads)
    d = c // num_heads
    if d % _LANES != 0 and d != 64:
        return xla_attention(q, k, v, num_heads)

    if _BLOCKS_OVERRIDE is not None:
        block_q, block_k, bwd_block_q, bwd_block_k = _BLOCKS_OVERRIDE
    elif d <= _LANES:
        # wide-KV default for narrow heads, padding-guarded
        # (see _choose_kv_blocks / _WIDE_K above)
        block_k, bwd_block_k = _choose_kv_blocks(sk, block_k, bwd_block_k)
    sm_scale = 1.0 / math.sqrt(d)
    bq = min(block_q, _next_multiple(sq, _LANES))
    bk = min(block_k, _next_multiple(sk, _LANES))
    bbq = min(bwd_block_q, _next_multiple(sq, _LANES))
    bbk = min(bwd_block_k, _next_multiple(sk, _LANES))
    # padding must satisfy both forward and backward tilings
    sq_pad = _next_multiple(sq, math.lcm(bq, bbq))
    sk_pad = _next_multiple(sk, math.lcm(bk, bbk))

    def split_heads(x, s_pad):
        s = x.shape[1]
        x = x.reshape(n, s, num_heads, d).transpose(0, 2, 1, 3)
        x = x.reshape(n * num_heads, s, d)
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        return x

    qh = split_heads(q, sq_pad)
    kh = split_heads(k, sk_pad)
    vh = split_heads(v, sk_pad)
    o = _flash(qh, kh, vh, sm_scale, bq, bk, bbq, bbk, sk)
    o = o[:, :sq, :].reshape(n, num_heads, sq, d).transpose(0, 2, 1, 3)
    return o.reshape(n, sq, c).astype(q.dtype)
