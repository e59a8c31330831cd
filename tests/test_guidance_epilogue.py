"""Fused guidance epilogue ≡ the optax chain (ε-rescale + Adam + DDIM).

The op under test replaces the sampler's per-step small-op chain
(reference marigold_dc.py:879-904 semantics) with one Pallas kernel; both
the XLA fallback and the interpreted Pallas kernel must reproduce the
sampler's original optax-based math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from depth_completion_tpu.ops import guidance_epilogue as ge
from depth_completion_tpu.sched.ddim import (
    DDIMConfig,
    ddim_step,
    make_schedule,
    pred_epsilon,
)

EPSILON = 1e-7


def _optax_reference(lat, g, out, opt_state, opt, sched, t, num_steps):
    """The sampler's original chain, verbatim semantics."""
    n = lat.shape[0]
    eps_ref = pred_epsilon(sched, out, t, lat)
    eps_norm = jnp.linalg.norm(eps_ref.reshape(n, -1).astype(jnp.float32), axis=1)
    gf = g.astype(jnp.float32)
    g_norm = jnp.linalg.norm(gf.reshape(n, -1), axis=1)
    factors = (eps_norm / jnp.maximum(g_norm, EPSILON)).reshape(n, 1, 1, 1)
    grads = {"latents": gf * factors}
    params = {"latents": lat}
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    new_lat, _ = ddim_step(sched, out, t, params["latents"], num_steps)
    return new_lat, opt_state


@pytest.mark.parametrize("ptype", ["v_prediction", "epsilon"])
@pytest.mark.parametrize("interpret", [False, True])
def test_epilogue_matches_optax_chain(ptype, interpret, monkeypatch):
    """3 chained steps: latent trajectory and moments match the optax path.
    ``interpret=True`` runs the actual Pallas kernel (interpreter mode,
    including the zero-padding path: K=24·17·4=1632, not tile-aligned)."""
    if interpret:
        monkeypatch.setattr(ge, "INTERPRET", True)
    monkeypatch.setenv("DCT_EPILOGUE", "on" if interpret else "off")

    cfg = DDIMConfig(prediction_type=ptype)
    sched = make_schedule(cfg)
    num_steps = 5
    rng = np.random.default_rng(3)
    shape = (2, 24, 17, 4)  # odd width → padded kernel tiles
    lat = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    opt = optax.adam(0.05, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init({"latents": lat})
    lat_ref = lat
    m = jnp.zeros_like(lat)
    v = jnp.zeros_like(lat)
    count = jnp.zeros((), jnp.int32)
    lat_fused = lat

    for i, t in enumerate([999, 799, 599]):
        g = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        out = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        t_arr = jnp.asarray(t)
        lat_ref, opt_state = _optax_reference(
            lat_ref, g, out, opt_state, opt, sched, t_arr, num_steps
        )
        lat_fused, m, v, count = ge.guided_epilogue(
            lat_fused, g, out, m, v, count, sched, t_arr, num_steps, lr=0.05
        )
        assert int(count) == i + 1
        np.testing.assert_allclose(
            np.asarray(lat_fused), np.asarray(lat_ref), rtol=2e-5, atol=2e-5
        )


def test_epilogue_under_jit_and_scan():
    """The op must trace inside jit/scan with a dynamic timestep carry."""
    cfg = DDIMConfig()
    sched = make_schedule(cfg)
    rng = np.random.default_rng(0)
    shape = (1, 8, 16, 4)
    lat = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    g = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    out = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    @jax.jit
    def run(lat):
        def body(carry, t):
            lat, m, v, count = carry
            lat, m, v, count = ge.guided_epilogue(
                lat, g, out, m, v, count, sched, t, 4, lr=0.05
            )
            return (lat, m, v, count), None

        carry = (lat, jnp.zeros_like(lat), jnp.zeros_like(lat),
                 jnp.zeros((), jnp.int32))
        (lat, *_), _ = jax.lax.scan(
            body, carry, jnp.asarray([999, 749, 499, 249])
        )
        return lat

    outl = run(lat)
    assert np.isfinite(np.asarray(outl)).all()


def test_sampler_fused_vs_optax_e2e(monkeypatch):
    """guided_sample end-to-end: DCT_EPILOGUE=on (XLA fallback math on CPU)
    ≡ DCT_EPILOGUE=off (the optax path) at tiny geometry."""
    from depth_completion_tpu.models.bundle import make_random_bundle
    from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

    bundle = make_random_bundle(seed=0, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    images = rng.uniform(0, 255, size=(1, 48, 64, 3)).astype(np.float32)
    sparse = np.zeros((1, 48, 64, 1), np.float32)
    mask = rng.random((1, 48, 64, 1)) < 0.05
    sparse[mask] = rng.uniform(2.0, 80.0, mask.sum()).astype(np.float32)
    cfg = SamplerConfig(
        steps=3, resolution=64, closed_form=False, max_depth=120.0
    )
    fn = jax.jit(guided_sample, static_argnames=("cfg",))

    monkeypatch.setenv("DCT_EPILOGUE", "off")
    d_off, l_off = fn(bundle, jnp.asarray(images), jnp.asarray(sparse), cfg)
    monkeypatch.setenv("DCT_EPILOGUE", "on")
    d_on, l_on = jax.jit(guided_sample, static_argnames=("cfg",))(
        bundle, jnp.asarray(images), jnp.asarray(sparse), cfg
    )
    np.testing.assert_allclose(
        np.asarray(d_on), np.asarray(d_off), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(l_on), np.asarray(l_off), rtol=1e-4, atol=1e-4
    )
