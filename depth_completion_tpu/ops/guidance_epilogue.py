"""Fused guidance-step epilogue: ε-rescale + Adam + DDIM in one kernel.

After the guidance backward pass, the reference performs (per DDIM step,
reference marigold_dc.py:879-904):

1. ε̂ from the pre-update latent, per-sample norms of ε̂ and the latent
   gradient, and the rescale ``g ← g · ‖ε̂‖/max(‖g‖, EPSILON)``;
2. the Adam moment/parameter update on the latent;
3. the DDIM transition applied to the *updated* latent with the old UNet
   output.

As XLA ops this is a chain of ~15 small fusions over [N, EH, EW, 4]
latents (≈110 KB each at smoke geometry), split by the two norm
reductions — each fusion a separate kernel launch and HBM round trip of
every operand. This module fuses the whole epilogue into ONE Pallas kernel
per sample: latents/grads/UNet-output/moments stream through VMEM once,
the norms are computed in-register, and the updated latent leaves already
DDIM-transitioned (one HBM round trip for the whole pytree).

Scope: Adam (torch defaults), v-prediction or epsilon prediction,
clip_sample=False — the Marigold configuration. Anything else falls back
to the reference XLA path in the sampler (optax + ddim_step).

The XLA fallback here (`_epilogue_xla`) implements the identical math and
is the CPU/test path; equivalence against the sampler's optax chain is
tested in tests/test_guidance_epilogue.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-7  # reference marigold_dc.py:20
_LANES = 128
_SUBLANES = 8

# Test hook: run the Pallas kernel in interpreter mode on CPU.
INTERPRET = False


def enabled() -> bool:
    """Fused epilogue engaged? Default OFF: the first on-device measurement
    (v5e, 2026-08-19, BENCH_r03 A/B) showed the fused path COSTS ~8 ms/step
    at smoke geometry instead of saving — the single-grid-point kernel plus
    the [N,EH,EW,4]→[N,R,128] relayouts lose more than the small-op chain
    it replaces. Kept behind DCT_EPILOGUE=on for further kernel work; the
    optax chain remains the production path (see PERF.md round-3)."""
    mode = os.environ.get("DCT_EPILOGUE", "off")
    if mode == "off":
        return False
    if mode == "on":
        return True
    return jax.default_backend() == "tpu" or INTERPRET


def _kernel(
    lat_ref, g_ref, out_ref, m_ref, v_ref, sc_ref,
    new_lat_ref, new_m_ref, new_v_ref,
    *, lr: float, b1: float, b2: float, adam_eps: float, v_pred: bool,
):
    """One sample's epilogue. Blocks are [1, R, 128] fp32; ``sc_ref`` is an
    SMEM row of per-step scalars [sa, s1, sap, s1p, bc1, bc2] (√ᾱ_t,
    √(1−ᾱ_t), √ᾱ_prev, √(1−ᾱ_prev), 1/(1−β₁ᵗ), 1/(1−β₂ᵗ))."""
    lat = lat_ref[0]
    g = g_ref[0]
    out = out_ref[0]
    sa = sc_ref[0]
    s1 = sc_ref[1]
    sap = sc_ref[2]
    s1p = sc_ref[3]
    bc1 = sc_ref[4]
    bc2 = sc_ref[5]

    # ε̂ on the pre-update latent (v→ε or identity), then the rescale.
    eps_hat = sa * out + s1 * lat if v_pred else out
    eps_norm = jnp.sqrt(jnp.sum(eps_hat * eps_hat))
    g_norm = jnp.sqrt(jnp.sum(g * g))
    g = g * (eps_norm / jnp.maximum(g_norm, EPSILON))

    # Adam (torch formulation: bias-corrected moments, eps outside sqrt).
    m = b1 * m_ref[0] + (1.0 - b1) * g
    v = b2 * v_ref[0] + (1.0 - b2) * g * g
    lat = lat - lr * (m * bc1) / (jnp.sqrt(v * bc2) + adam_eps)

    # DDIM transition on the UPDATED latent with the old model output.
    if v_pred:
        x0 = sa * lat - s1 * out
        eps = sa * out + s1 * lat
    else:
        x0 = (lat - s1 * out) * (1.0 / sa)
        eps = out
    new_lat_ref[0] = sap * x0 + s1p * eps
    new_m_ref[0] = m
    new_v_ref[0] = v


def _scalars(sched, t, prev_t, count, b1: float, b2: float, v_pred: bool):
    """Per-step scalar row [6] float32 (computed in XLA, negligible)."""
    a_t = sched.alpha_at(t).astype(jnp.float32)
    a_p = sched.alpha_at(prev_t).astype(jnp.float32)
    tf = count.astype(jnp.float32) + 1.0
    return jnp.stack(
        [
            jnp.sqrt(a_t),
            jnp.sqrt(1.0 - a_t),
            jnp.sqrt(a_p),
            jnp.sqrt(1.0 - a_p),
            1.0 / (1.0 - b1**tf),
            1.0 / (1.0 - b2**tf),
        ]
    )


def _epilogue_xla(lat, g, out, m, v, sc, *, lr, b1, b2, adam_eps, v_pred):
    """Reference XLA implementation (CPU fallback), same math as the kernel.
    Operates on [N, K] flattened latents; norms reduce over K."""
    sa, s1, sap, s1p, bc1, bc2 = (sc[i] for i in range(6))
    eps_hat = sa * out + s1 * lat if v_pred else out
    eps_norm = jnp.linalg.norm(eps_hat, axis=1, keepdims=True)
    g_norm = jnp.linalg.norm(g, axis=1, keepdims=True)
    g = g * (eps_norm / jnp.maximum(g_norm, EPSILON))
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    lat = lat - lr * (m * bc1) / (jnp.sqrt(v * bc2) + adam_eps)
    if v_pred:
        x0 = sa * lat - s1 * out
        eps = sa * out + s1 * lat
    else:
        x0 = (lat - s1 * out) / sa
        eps = out
    return sap * x0 + s1p * eps, m, v


def guided_epilogue(
    latents: jnp.ndarray,
    grads: jnp.ndarray,
    model_out: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray,
    count: jnp.ndarray,
    sched,
    t: jnp.ndarray,
    num_steps: int,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    adam_eps: float = 1e-8,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused ε-rescale + Adam + DDIM over [N, EH, EW, 4] fp32 latents.

    ``m``/``v`` are the Adam moments for the latents, ``count`` the int32
    step counter (optax semantics: bias correction uses count+1). Returns
    ``(new_latents, new_m, new_v, new_count)`` — exactly the composition
    the sampler's optax path computes (reference marigold_dc.py:879-904).
    """
    cfg = sched.config
    v_pred = cfg.prediction_type == "v_prediction"
    if cfg.prediction_type not in ("v_prediction", "epsilon") or cfg.clip_sample:
        raise ValueError(
            "fused epilogue supports v/ε prediction without sample clipping"
        )
    prev_t = t - cfg.num_train_timesteps // num_steps
    sc = _scalars(sched, t, prev_t, count, b1, b2, v_pred)

    n = latents.shape[0]
    shape = latents.shape
    k = 1
    for d in shape[1:]:
        k *= d

    f32 = jnp.float32
    flat = lambda x: x.astype(f32).reshape(n, k)  # noqa: E731
    lat, g, out, m2, v2 = map(flat, (latents, grads, model_out, m, v))

    if not (enabled() and (jax.default_backend() == "tpu" or INTERPRET)):
        new_lat, new_m, new_v = _epilogue_xla(
            lat, g, out, m2, v2, sc,
            lr=lr, b1=b1, b2=b2, adam_eps=adam_eps, v_pred=v_pred,
        )
        return (
            new_lat.reshape(shape).astype(latents.dtype),
            new_m.reshape(shape),
            new_v.reshape(shape),
            count + 1,
        )

    # Pad K up to a full [R, 128] tile grid. Zero padding is exact: zeros
    # contribute nothing to the norms, Adam keeps them at zero, and the
    # DDIM combine of zeros is sliced away below.
    tile = _SUBLANES * _LANES
    k_pad = (k + tile - 1) // tile * tile
    if k_pad != k:
        pad = lambda x: jnp.pad(x, ((0, 0), (0, k_pad - k)))  # noqa: E731
        lat, g, out, m2, v2 = map(pad, (lat, g, out, m2, v2))
    r = k_pad // _LANES
    shape3 = (n, r, _LANES)
    lat, g, out, m2, v2 = (x.reshape(shape3) for x in (lat, g, out, m2, v2))

    kernel = functools.partial(
        _kernel, lr=lr, b1=b1, b2=b2, adam_eps=adam_eps, v_pred=v_pred
    )
    block = pl.BlockSpec((1, r, _LANES), lambda i: (i, 0, 0))
    new_lat, new_m, new_v = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            block, block, block, block, block,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[block, block, block],
        out_shape=[jax.ShapeDtypeStruct(shape3, f32)] * 3,
        interpret=INTERPRET,
    )(lat, g, out, m2, v2, sc)

    unflat = lambda x: x.reshape(n, k_pad)[:, :k].reshape(shape)  # noqa: E731
    return (
        unflat(new_lat).astype(latents.dtype),
        unflat(new_m),
        unflat(new_v),
        count + 1,
    )
