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
