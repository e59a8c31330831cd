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
    """The eval_shape attention-flop recorder matches a hand count AND only
    counts call sites that would take the Pallas path (ADVICE r4: XLA's
    cost analysis already covers the fallback sites — short sequences like
    the cross-attention context, or non-tileable head dims — so counting
    them here would double-count). Single-stage UNet, transformers at
    down(1) + mid(1) + up(2): self-attention at S=1024 >= min_seq_len with
    d=64 takes Pallas and is counted; cross-attention (S_ctx tokens << 768)
    falls back and must NOT be counted."""
    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig

    cfg1 = registry.UNetConfig(
        block_out_channels=(64,),
        num_heads=(1,),  # d = 64 -> Pallas-tileable head dim
        attention_stages=(True,),
        layers_per_block=1,
        cross_attention_dim=64,
        norm_groups=8,
    )
    bundle = make_random_bundle(seed=0, unet_config=cfg1, vae_kind="tiny")
    import numpy as np

    # 256x256 input at res 256 -> 32x32 latent -> S = 1024 >= 768
    images = jnp.asarray(np.zeros((1, 256, 256, 3), np.float32))
    cfg = SamplerConfig(steps=2, resolution=256, max_depth=120.0)
    got = bench._attention_fwd_flops(bundle, images, cfg)
    assert got is not None
    from depth_completion_tpu.ops.resize import latent_size

    eh, ew = latent_size((256, 256), 256, bundle.vae.downsample_factor)
    s = eh * ew
    assert s >= 768
    # 4 transformers (down 1, mid 1, up 2), each ONE self (S x S) score/value
    # pair at C=64, 2 FLOPs/MAC; cross-attention excluded (falls back to XLA)
    expected = 4 * (4.0 * 1 * s * s * 64)
    assert got == expected, (got, expected)


def test_attention_fwd_flops_all_fallback_counts_zero():
    """A geometry where every attention site falls back to XLA (S < 768 and
    d=16 non-tileable) must report zero Pallas-hidden flops — those dots are
    already in XLA's cost analysis."""
    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig

    cfg1 = registry.UNetConfig(
        block_out_channels=(32,),
        num_heads=(2,),  # d = 16: not 64, not %128 -> always XLA fallback
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
    assert got == 0.0, got


def test_retry_fails_then_succeeds(monkeypatch):
    """The BENCH_r04 scenario: the first run dies on a transient backend
    error, the retry lands clean — the bench must survive (VERDICT r4 #1).
    on_retry (the fresh device_put hook) runs before the retry attempt."""
    monkeypatch.setenv("BENCH_RETRY_BACKOFF_S", "0")
    calls = {"n": 0, "refresh": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return 42.0

    out = bench._retry(
        flaky, attempts=3, label="first run",
        on_retry=lambda: calls.__setitem__("refresh", calls["refresh"] + 1),
    )
    assert out == 42.0
    assert calls["n"] == 2
    assert calls["refresh"] == 1


def test_retry_exhausted_raises_last(monkeypatch):
    monkeypatch.setenv("BENCH_RETRY_BACKOFF_S", "0")
    calls = {"n": 0}

    def dead():
        calls["n"] += 1
        raise ValueError(f"boom {calls['n']}")

    with pytest.raises(ValueError, match="boom 3"):
        bench._retry(dead, attempts=3)
    assert calls["n"] == 3


def test_retry_failed_on_retry_does_not_mask(monkeypatch):
    """A broken refresh hook must not replace the real backend error."""
    monkeypatch.setenv("BENCH_RETRY_BACKOFF_S", "0")

    def dead():
        raise RuntimeError("real error")

    def broken_refresh():
        raise OSError("refresh broke too")

    with pytest.raises(RuntimeError, match="real error"):
        bench._retry(dead, attempts=2, on_retry=broken_refresh)


def test_main_emits_error_json_on_total_failure(monkeypatch, capsys):
    """Even when every retry is exhausted, main prints ONE parseable JSON
    line carrying the error — the scoreboard artifact is never an opaque
    traceback (BENCH_r04 post-mortem)."""
    import json

    def dead_measure():
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    monkeypatch.setattr(bench, "_measure", dead_measure)
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "frames_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert "FAILED_PRECONDITION" in rec["error"]
    assert rec["git_commit"]


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


def _mkev(cat=None, dur_us=1000, flops=0, nbytes=0, src="", pid=1, name="op"):
    args = {}
    if cat is not None:
        args["hlo_category"] = cat
        args["device_duration_ps"] = int(dur_us * 1e6)
    if flops:
        args["model_flops"] = str(flops)
    if nbytes:
        args["raw_bytes_accessed"] = str(nbytes)
    if src:
        args["source"] = src
    return {"ph": "X", "pid": pid, "name": name, "dur": dur_us, "args": args}


def _device_meta(pid=1):
    return {
        "ph": "M", "pid": pid, "name": "process_name",
        "args": {"name": "/device:TPU:0"},
    }


def test_analyze_trace_events_roofline():
    """Hand-checkable roofline: one flop-bound fusion, one bandwidth-bound
    fusion, one flash custom-call (analytic floor), one opaque custom-call
    (measured floor), async bookkeeping excluded, module span = longest."""
    peak_tf, bw = 100.0, 100.0  # 100 TF/s, 100 GB/s
    steps = 10
    events = [
        _device_meta(),
        # module container (no hlo_category): span 100 ms -> 10 ms/step
        {"ph": "X", "pid": 1, "name": "jit_m", "dur": 100_000, "args": {}},
        # flop-bound: 1e12 flops / 1e14 = 10 ms floor (measured 20 ms)
        _mkev("convolution fusion", 20_000, flops=1e12, nbytes=1),
        # bandwidth-bound: 1e9 bytes / 1e11 = 10 ms floor (measured 12 ms)
        _mkev("loop fusion", 12_000, flops=1, nbytes=1e9),
        # flash custom-call: zero flops/bytes, floored analytically
        _mkev("custom-call", 30_000,
              src="/x/depth_completion_tpu/ops/flash_attention.py:905"),
        # opaque custom-call (conv3x3): measured time 8 ms is its own floor
        _mkev("custom-call", 8_000, src="/x/ops/conv3x3.py:162"),
        # async bookkeeping: excluded from the floor entirely
        _mkev("async-done", 50_000, nbytes=1e12),
        # scan container: excluded
        _mkev("while", 90_000),
        # host-side event: ignored (wrong track)
        _mkev("convolution fusion", 99_000, flops=1e15, pid=2),
    ]
    # analytic attention: 1e11 fwd flops/step * 2.0 bwd factor * 10 steps
    # / 1e14 = 20 ms total -> 2 ms/step
    out = bench._analyze_trace_events(
        events, steps, peak_tf, bw, attn_fwd_flops_step=1e11,
        attn_bwd_factor=2.0,
    )
    assert out["device_step_ms"] == 10.0
    # floor: 10 (conv) + 10 (bw) + 8 (opaque) + 20 (attn) = 48 ms -> 4.8/step
    assert out["sol_roofline_ms"] == 4.8, out
    assert out["sol_pct"] == 48.0, out
    assert out["sol_attn_measured_ms"] == 3.0  # 30 ms / 10 steps
    assert out["sol_opaque_kernel_ms"] == 0.8
    assert "async-done" in out["sol_breakdown_ms"]  # measured, not floored
    assert "while" not in out["sol_breakdown_ms"]


def test_analyze_trace_events_no_attn_analytic_falls_back():
    """Without analytic attention flops the flash events fall back to
    measured-as-floor (conservative), not zero."""
    events = [
        _device_meta(),
        {"ph": "X", "pid": 1, "name": "jit_m", "dur": 50_000, "args": {}},
        _mkev("custom-call", 30_000,
              src="/x/depth_completion_tpu/ops/flash_attention.py:905"),
    ]
    out = bench._analyze_trace_events(
        events, 10, 100.0, 100.0, attn_fwd_flops_step=None,
        attn_bwd_factor=3.5,
    )
    assert out["sol_roofline_ms"] == 3.0
    assert out["sol_opaque_kernel_ms"] == 3.0


def test_analyze_trace_events_device_step_only_without_peaks():
    events = [
        _device_meta(),
        {"ph": "X", "pid": 1, "name": "jit_m", "dur": 80_000, "args": {}},
    ]
    out = bench._analyze_trace_events(events, 8, None, None, None, 3.5)
    assert out == {"device_step_ms": 10.0}


def test_peak_hbm_mapping(monkeypatch):
    monkeypatch.delenv("BENCH_PEAK_HBM_GBPS", raising=False)
    assert bench._peak_hbm_gbps("TPU v5 lite") == 819.0
    assert bench._peak_hbm_gbps("TPU v6e") == 1640.0
    assert bench._peak_hbm_gbps("Quantum Chip") is None
    monkeypatch.setenv("BENCH_PEAK_HBM_GBPS", "1234")
    assert bench._peak_hbm_gbps("Quantum Chip") == 1234.0


def test_conv_call_costs_hand_count():
    """Executed-work cost of one fused conv3x3 call: dense 3x3 conv MACs at
    the (packed) shapes actually dispatched, plus in/out/skip HBM traffic."""
    flops, nbytes = bench._conv_call_costs((2, 8, 16, 128), 128, 2, True)
    assert flops == 2.0 * 2 * 8 * 16 * 9 * 128 * 128
    assert nbytes == 2 * 8 * 16 * 2 * (128 + 128 + 128)
    flops2, nbytes2 = bench._conv_call_costs((1, 4, 8, 64), 32, 4, False)
    assert flops2 == 2.0 * 1 * 4 * 8 * 9 * 64 * 32
    assert nbytes2 == 1 * 4 * 8 * 4 * (64 + 32)


def test_conv3x3_fwd_costs_records_decode_path():
    """The eval_shape recorder traverses the real TAESD decode at a
    supported geometry and returns positive executed-work costs without
    touching the device (pure abstract trace)."""
    import numpy as np

    from depth_completion_tpu.models import registry
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig

    bundle = make_random_bundle(
        seed=0, vae_kind="tiny", vae_config=registry.TAESD_CONFIG
    )
    # 256x256 at res 256 -> 32x32 latent; packed decode widths stay %8
    # and packed channels hit the 128-lane contract, so the fused kernel
    # gate passes at every backbone conv
    images = jnp.asarray(np.zeros((1, 256, 256, 3), np.float32))
    cfg = SamplerConfig(steps=2, resolution=256, max_depth=120.0)
    out = bench._conv3x3_fwd_costs(bundle, images, cfg)
    assert out is not None
    flops, nbytes = out
    # TAESD decode at this geometry: dozens of packed 128x128 convs across
    # 32..256-px stages — order 1e10-1e12 flops, 1e8-1e10 bytes
    assert 1e10 < flops < 1e13, flops
    assert 1e7 < nbytes < 1e11, nbytes


def test_analyze_trace_events_conv_analytic_floor():
    """conv3x3-source zero-cost events are floored by the recorded decode
    costs (x conv_factor per step), not their measured time."""
    events = [
        _device_meta(),
        {"ph": "X", "pid": 1, "name": "jit_m", "dur": 100_000, "args": {}},
        _mkev("custom-call", 40_000, src="/x/ops/conv3x3.py:162"),
    ]
    # conv costs: 1e12 flops, tiny bytes -> flop-bound: 10 ms/eval at
    # 100 TF/s; factor 2 x 10 steps -> 200 ms total -> 20 ms/step floor
    out = bench._analyze_trace_events(
        events, 10, 100.0, 100.0, None, 3.5,
        conv_costs=(1e12, 1.0), conv_factor=2.0,
    )
    assert out["sol_roofline_ms"] == 20.0, out
    assert out["sol_conv_measured_ms"] == 4.0  # 40 ms / 10 steps
    assert out["sol_opaque_kernel_ms"] == 0.0
