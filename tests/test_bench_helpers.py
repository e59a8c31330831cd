"""bench.py helper functions (the JSON line's hardware-grounded fields).

The bench itself needs a TPU; these cover the pure pieces on CPU so a
broken helper fails here instead of silently dropping mfu_pct/sol_pct
from BENCH_rNN.json.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_peak_tflops_mapping(monkeypatch):
    monkeypatch.delenv("BENCH_PEAK_TFLOPS", raising=False)
    assert bench._peak_tflops("TPU v5 lite") == 197.0
    assert bench._peak_tflops("TPU v5e") == 197.0
    assert bench._peak_tflops("TPU v4") == 275.0
    assert bench._peak_tflops("TPU v6 lite") == 918.0
    assert bench._peak_tflops("Quantum Chip 9000") is None
    monkeypatch.setenv("BENCH_PEAK_TFLOPS", "123.5")
    assert bench._peak_tflops("Quantum Chip 9000") == 123.5


def test_program_flops_from_cost_analysis():
    @jax.jit
    def f(x):
        return x @ x

    x = jnp.zeros((128, 128), jnp.float32)
    compiled = f.lower(x).compile()
    flops = bench._program_flops(compiled)
    if flops is None:
        pytest.skip("backend reports no cost analysis")
    # 2*n^3 MACs-as-FLOPs, allow backend accounting slack
    assert 0.5 * 2 * 128**3 <= flops <= 4 * 2 * 128**3


def test_attention_fwd_flops_hand_count():
    """The eval_shape attention-flop recorder matches a hand count on a
    single-stage UNet: transformers at down(1) + mid(1) + up(2), each one
    self-attention (S x S) plus one cross-attention (S x S_ctx) at C=32."""
    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig

    cfg1 = registry.UNetConfig(
        block_out_channels=(32,),
        num_heads=(2,),
        attention_stages=(True,),
        layers_per_block=1,
        cross_attention_dim=32,
        norm_groups=8,
    )
    bundle = make_random_bundle(seed=0, unet_config=cfg1, vae_kind="tiny")
    import numpy as np

    images = jnp.asarray(np.zeros((1, 64, 64, 3), np.float32))
    cfg = SamplerConfig(steps=2, resolution=64, max_depth=120.0)
    got = bench._attention_fwd_flops(bundle, images, cfg)
    assert got is not None
    from depth_completion_tpu.ops.resize import latent_size

    eh, ew = latent_size((64, 64), 64, bundle.vae.downsample_factor)
    s = eh * ew
    s_ctx = int(bundle.text_context.shape[1])
    # 4 transformers (down 1, mid 1, up 2), each one self (S x S) + one
    # cross (S x S_ctx) score/value pair at C=32, 2 FLOPs/MAC
    expected = 4 * (4.0 * 1 * s * s * 32 + 4.0 * 1 * s * s_ctx * 32)
    assert got == expected, (got, expected)


def test_sol_components_deadline_skips(monkeypatch):
    """With an already-expired deadline every component is skipped and no
    sol_step_ms is fabricated."""
    calls = []
    monkeypatch.setattr(
        bench, "_chained_ms_per_call", lambda fn, x: calls.append(1) or 1.0
    )
    # expired deadline: _T0 is module import time, so deadline 0 has passed
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig

    bundle = make_random_bundle(seed=0, vae_kind="tiny")
    import numpy as np

    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, 32, 48, 3)), jnp.float32
    )
    sparse = jnp.zeros((1, 32, 48, 1), jnp.float32).at[0, ::8, ::8, 0].set(5.0)
    cfg = SamplerConfig(steps=2, resolution=32, max_depth=120.0)
    comp = bench._sol_components(bundle, images, sparse, cfg, deadline_s=0.0)
    assert comp is not None
    assert comp.get("sol_step_ms") is None
    assert not calls  # nothing measured past the deadline
