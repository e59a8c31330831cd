"""Flash attention kernels vs the XLA reference (Pallas interpreter on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import depth_completion_tpu.ops.flash_attention as fa
from depth_completion_tpu.models.layers import attention as xla_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _qkv(n=2, s=256, c=128, sk=None, seed=0):
    rng = np.random.default_rng(seed)
    sk = s if sk is None else sk
    q = jnp.asarray(rng.normal(size=(n, s, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, sk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, sk, c)), jnp.float32)
    return q, k, v


def test_forward_matches_xla_aligned():
    q, k, v = _qkv(s=256, c=128)
    out = fa.flash_attention(q, k, v, num_heads=2, block_q=128, block_k=128, min_seq_len=1)
    ref = xla_attention(q, k, v, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_forward_matches_xla_ragged():
    """Sequence length not a multiple of the block size (padding + mask)."""
    q, k, v = _qkv(s=192, c=128)  # 192 = 1.5 * 128
    out = fa.flash_attention(q, k, v, num_heads=2, block_q=128, block_k=128, min_seq_len=1)
    ref = xla_attention(q, k, v, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_forward_head_dim_64():
    q, k, v = _qkv(s=128, c=256)  # 4 heads × 64
    out = fa.flash_attention(q, k, v, num_heads=4, block_q=128, block_k=128, min_seq_len=1)
    ref = xla_attention(q, k, v, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_single_head_d512_vae_geometry():
    """The KL VAE mid-attention shape class: num_heads=1, head_dim=512
    (> the 128-lane stat width). Regression test for the lane-slice bug
    where the fwd kernel sliced its [block_q, 128] alpha/l stats to
    d=512 lanes and failed to trace — fwd AND grad must match XLA."""
    q, k, v = _qkv(n=1, s=256, c=512, seed=7)
    out = fa.flash_attention(
        q, k, v, num_heads=1, block_q=128, block_k=128,
        bwd_block_q=128, bwd_block_k=128, min_seq_len=1,
    )
    ref = xla_attention(q, k, v, num_heads=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def loss_fa(q, k, v):
        o = fa.flash_attention(
            q, k, v, 1, block_q=128, block_k=128,
            bwd_block_q=128, bwd_block_k=128, min_seq_len=1,
        )
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_attention(q, k, v, 1)))

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
        )


def test_backward_matches_xla():
    q, k, v = _qkv(s=256, c=128)

    def loss_fa(q, k, v):
        o = fa.flash_attention(q, k, v, 2, block_q=128, block_k=128, min_seq_len=1)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_attention(q, k, v, 2)))

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"grad d{name} mismatch",
        )


def test_backward_ragged():
    q, k, v = _qkv(s=192, c=128)

    def loss_fa(q, k, v):
        o = fa.flash_attention(q, k, v, 2, block_q=128, block_k=128, min_seq_len=1)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, 2)
        return jnp.sum(o * o)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"grad d{name} mismatch",
        )


def test_short_kv_falls_back():
    """Cross-attention over the 2-token context uses the XLA path."""
    q, k, v = _qkv(s=128, c=128, sk=2)
    out = fa.flash_attention(q, k, v, num_heads=2)  # min_seq_len default 1024
    ref = xla_attention(q, k, v, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_forward_head_dim_128():
    q, k, v = _qkv(s=128, c=256)  # 2 heads x 128
    out = fa.flash_attention(q, k, v, num_heads=2, block_q=128, block_k=128,
                             bwd_block_q=128, bwd_block_k=128, min_seq_len=1)
    ref = xla_attention(q, k, v, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_mixed_fwd_bwd_blocks():
    q, k, v = _qkv(s=320, c=128)  # pad to lcm coverage
    def loss(q, k, v):
        o = fa.flash_attention(q, k, v, 2, block_q=128, block_k=256,
                               bwd_block_q=256, bwd_block_k=128, min_seq_len=1)
        return jnp.sum(o * o)
    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, 2)
        return jnp.sum(o * o)
    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_two_pass_backward_matches_fused():
    q, k, v = _qkv(s=256, c=128, seed=7)

    def loss(q, k, v):
        o = fa.flash_attention(q, k, v, 2, block_q=128, block_k=128,
                               bwd_block_q=128, bwd_block_k=128, min_seq_len=1)
        return jnp.sum(jnp.cos(o))

    fa.FUSED_BWD = True
    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    try:
        fa.FUSED_BWD = False
        g_two = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.FUSED_BWD = True
    for a, b in zip(g_fused, g_two):
        # dq: the fused path's per-KV-block partials are stored in bf16
        # (fa.DQ_PARTIALS_DTYPE) while the two-pass path accumulates dq in
        # f32 scratch, so agreement is bf16-class, not exact.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_two_stream_forward_matches_single():
    """FWD_STREAMS=2 (two independent q-row streams per kernel body) is the
    same math on disjoint rows — bit-equal output and identical grads up to
    the bf16 dq-partial noise."""
    q, k, v = _qkv(s=512, c=128, seed=9)  # 4 q-blocks of 128 → 2 stream pairs

    def run(streams):
        def loss(q, k, v):
            o = fa.flash_attention(q, k, v, 2, block_q=128, block_k=128,
                                   bwd_block_q=128, bwd_block_k=128,
                                   min_seq_len=1)
            return o, jnp.sum(jnp.cos(o))

        old = fa.FWD_STREAMS
        fa.FWD_STREAMS = streams
        try:
            o, _ = loss(q, k, v)
            g = jax.grad(lambda *a: loss(*a)[1], argnums=(0, 1, 2))(q, k, v)
        finally:
            fa.FWD_STREAMS = old
        return o, g

    o1, g1 = run(1)
    o2, g2 = run(2)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_two_stream_backward_matches_single():
    """BWD_STREAMS=2: the fused backward's streams accumulate dk/dv in the
    same qi order as separate grid steps — grads are bit-equal."""
    q, k, v = _qkv(s=512, c=128, seed=11)

    def grads():
        def loss(q, k, v):
            o = fa.flash_attention(q, k, v, 2, block_q=128, block_k=128,
                                   bwd_block_q=128, bwd_block_k=128,
                                   min_seq_len=1)
            return jnp.sum(jnp.cos(o))

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    # Pin the baseline at streams=1 explicitly (the module default may be 2)
    # and restore whatever was set before, so no state leaks into later tests.
    old = fa.BWD_STREAMS
    try:
        fa.BWD_STREAMS = 1
        g1 = grads()
        fa.BWD_STREAMS = 2
        g2 = grads()
    finally:
        fa.BWD_STREAMS = old
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transposed_forward_matches_baseline(monkeypatch):
    """DCT_FWD_TRANSPOSED builds scores [block_k, block_q] and emits o^T
    from the PV contraction; same math, so (o, m̂) must match the baseline
    forward to f32 accumulation order, grads must survive unchanged (the
    VJP residual layouts are converted back inside _fwd_t), and the output
    must match XLA. Covers streams, ragged tails, d=64 and d=512."""
    for streams, (s, c, heads) in (
        (1, (256, 128, 2)),
        (2, (512, 256, 4)),   # two q-row streams, d=64 heads
        (1, (192, 128, 2)),   # ragged (tail mask)
        (1, (256, 512, 1)),   # KL VAE geometry class: single head, d=512
    ):
        monkeypatch.setattr(fa, "FWD_STREAMS", streams)
        q, k, v = _qkv(s=s, c=c, seed=7)
        kwargs = dict(
            block_q=128, block_k=128, bwd_block_q=128, bwd_block_k=128,
            min_seq_len=1,
        )

        monkeypatch.setattr(fa, "FWD_TRANSPOSED", False)
        o_base = fa.flash_attention(q, k, v, heads, **kwargs)
        monkeypatch.setattr(fa, "FWD_TRANSPOSED", True)
        o_t = fa.flash_attention(q, k, v, heads, **kwargs)
        np.testing.assert_allclose(
            np.asarray(o_t), np.asarray(o_base), rtol=2e-3, atol=2e-3,
            err_msg=f"transposed fwd mismatch (streams={streams}, s={s}, c={c})",
        )
        o_ref = xla_attention(q, k, v, heads)
        np.testing.assert_allclose(
            np.asarray(o_t), np.asarray(o_ref), rtol=2e-3, atol=2e-3,
            err_msg="transposed-fwd-vs-xla mismatch",
        )

        # m̂ feeds the backward: grads through the transposed forward must
        # match the baseline path (both use the fused backward kernels)
        def loss(q, k, v, heads=heads):
            o = fa.flash_attention(q, k, v, heads, **kwargs)
            return jnp.sum(jnp.sin(o))

        g_t = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setattr(fa, "FWD_TRANSPOSED", False)
        g_base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_t, g_base, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"transposed-fwd grad d{name} mismatch "
                        f"(streams={streams}, s={s}, c={c})",
            )


def test_transposed_backward_matches_baseline(monkeypatch):
    """DCT_BWD_TRANSPOSED computes dk/dv/dq with [d, S]-oriented output
    matmuls (full-lane MXU); same math, so grads must match the baseline
    fused backward bit-for-bit up to f32 accumulation order — and both
    must match XLA. Covers streams=1 and 2, ragged and d=64 shapes."""
    for streams, (s, c, heads) in (
        (1, (256, 128, 2)),
        (2, (512, 256, 4)),   # two q-row streams, d=64 heads
        (1, (192, 128, 2)),   # ragged (tail mask)
    ):
        monkeypatch.setattr(fa, "BWD_STREAMS", streams)
        q, k, v = _qkv(s=s, c=c, seed=3)

        def loss(q, k, v, heads=heads):
            o = fa.flash_attention(
                q, k, v, heads, block_q=128, block_k=128,
                bwd_block_q=128, bwd_block_k=128, min_seq_len=1,
            )
            return jnp.sum(jnp.sin(o))

        monkeypatch.setattr(fa, "BWD_TRANSPOSED", False)
        g_base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setattr(fa, "BWD_TRANSPOSED", True)
        g_t = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_t, g_base, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"transposed grad d{name} mismatch "
                        f"(streams={streams}, s={s}, c={c})",
            )

        def loss_ref(q, k, v, heads=heads):
            return jnp.sum(jnp.sin(xla_attention(q, k, v, heads)))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_t, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
                err_msg=f"transposed-vs-xla grad d{name} mismatch",
            )


def test_choose_kv_blocks_padding_guard():
    """The wide-KV default engages only when it does not inflate KV
    padding (round-5 review: a blind 2304 at KITTI stage-0 S=2688 would
    pad to 4608 where 1024 pads to 3072)."""
    from depth_completion_tpu.ops.flash_attention import _WIDE_K, _choose_kv_blocks

    assert _WIDE_K == 2304  # the swept optimum (PERF.md round-5)
    # bench stage-0: 6912 = 3*2304 exact -> wide
    assert _choose_kv_blocks(6912, 1024, 1024) == (2304, 2304)
    # KITTI stage-0: wide would pad 2688 -> 4608 (+71%) -> keep narrow
    assert _choose_kv_blocks(2688, 1024, 1024) == (1024, 1024)
    # stage-1 1728: effective wide block min()s to 1792 (pad 64) vs
    # narrow 1024 (pad to 2048) -> wide
    assert _choose_kv_blocks(1728, 1024, 1024) == (2304, 2304)
    # native KITTI 6688: wide pads to 6912 (3.3%) vs narrow 7168 -> wide
    assert _choose_kv_blocks(6688, 1024, 1024) == (2304, 2304)
    # S = 3072: wide pads to 4608, narrow exact -> narrow
    assert _choose_kv_blocks(3072, 1024, 1024) == (1024, 1024)
