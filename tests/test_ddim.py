"""DDIM schedule and step algebra — closed-form expectations.

Strategy per SURVEY.md §4: pure-math kernels are validated against exact
formulas computed independently with numpy, plus invariants (round trips,
terminal behavior, trailing spacing).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from depth_completion_tpu.sched import (
    DDIMConfig,
    ddim_step,
    make_lcm_timesteps,
    make_schedule,
    make_timesteps,
    pred_epsilon,
    pred_original,
)


def _np_alphas_cumprod(beta_start=0.00085, beta_end=0.012, T=1000):
    betas = np.linspace(beta_start**0.5, beta_end**0.5, T) ** 2
    return np.cumprod(1 - betas)


def test_schedule_matches_numpy():
    sched = make_schedule(DDIMConfig())
    expected = _np_alphas_cumprod()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), expected, rtol=1e-6)
    # set_alpha_to_one=False → final ᾱ is ᾱ₀
    np.testing.assert_allclose(
        float(sched.final_alpha_cumprod), expected[0], rtol=1e-6
    )


def test_trailing_timesteps_50():
    ts = make_timesteps(DDIMConfig(), 50)
    # trailing spacing: 999, 979, ..., 19 (descending, last step hits t=19)
    assert ts[0] == 999
    assert ts[-1] == 19
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_trailing_timesteps_uneven():
    ts = make_timesteps(DDIMConfig(), 7)
    assert ts[0] == 999
    assert len(ts) == 7
    assert np.all(np.diff(ts) < 0)


@pytest.mark.parametrize("ptype", ["epsilon", "v_prediction", "sample"])
def test_pred_original_epsilon_consistency(ptype):
    """x_t reconstructed from (x0, eps) must equal the input sample."""
    sched = make_schedule(DDIMConfig(prediction_type=ptype))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), dtype=jnp.float32)
    out = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), dtype=jnp.float32)
    t = jnp.asarray(500)
    x0 = pred_original(sched, out, t, x)
    eps = pred_epsilon(sched, out, t, x)
    a = float(sched.alphas_cumprod[500])
    recon = np.sqrt(a) * np.asarray(x0) + np.sqrt(1 - a) * np.asarray(eps)
    np.testing.assert_allclose(recon, np.asarray(x), atol=1e-5)


def test_ddim_step_closed_form_v_prediction():
    sched = make_schedule(DDIMConfig())
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    v = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    t, steps = 999, 50
    prev, x0 = ddim_step(sched, jnp.asarray(v), jnp.asarray(t), jnp.asarray(x), steps)
    ac = _np_alphas_cumprod()
    a_t, a_prev = ac[t], ac[t - 1000 // steps]
    x0_np = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * v
    eps_np = np.sqrt(a_t) * v + np.sqrt(1 - a_t) * x
    prev_np = np.sqrt(a_prev) * x0_np + np.sqrt(1 - a_prev) * eps_np
    np.testing.assert_allclose(np.asarray(x0), x0_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prev), prev_np, atol=1e-5)


def test_ddim_final_step_uses_final_alpha():
    """At the last trailing step (t=19, prev_t=-1) ᾱ_prev = ᾱ₀ ⇒ output ≈ x0."""
    sched = make_schedule(DDIMConfig())
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    prev, x0 = ddim_step(sched, v, jnp.asarray(19), x, 50)
    a_final = float(sched.final_alpha_cumprod)
    assert a_final > 0.999  # ᾱ₀ of the SD schedule is ~0.99915
    np.testing.assert_allclose(
        np.asarray(prev), np.asarray(x0), atol=0.15
    )  # small ε leakage via sqrt(1-ᾱ₀)


def test_lcm_timesteps_subsample():
    ts = make_lcm_timesteps(1000, 4)
    assert len(ts) == 4
    assert ts[0] == 999
    assert np.all(np.diff(ts) < 0)
    # all timesteps lie on the origin grid k*i - 1, k = 20
    assert np.all((ts + 1) % 20 == 0)


def test_lcm_timesteps_match_diffusers():
    # Hand-computed diffusers LCMScheduler.set_timesteps vectors
    # (T=1000, original_inference_steps=50 → k=20; indices are
    # floor(linspace(0, 50, steps, endpoint=False)) into the descending
    # origin grid 20*(50-j) - 1).
    expected = {
        1: [999],
        2: [999, 499],
        4: [999, 759, 499, 259],
        8: [999, 879, 759, 639, 499, 379, 259, 139],
        50: list(range(999, 0, -20)),
    }
    for steps, want in expected.items():
        ts = make_lcm_timesteps(1000, steps)
        np.testing.assert_array_equal(np.asarray(ts), np.asarray(want, np.int32))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_lcm_timesteps(1000, 51)


def test_leading_and_linspace_spacings():
    cfg_lead = DDIMConfig(timestep_spacing="leading")
    ts = make_timesteps(cfg_lead, 50)
    assert len(ts) == 50 and ts[-1] == 0 + cfg_lead.steps_offset
    assert np.all(np.diff(ts) < 0)
    cfg_lin = DDIMConfig(timestep_spacing="linspace")
    ts = make_timesteps(cfg_lin, 50)
    assert ts[0] == 999 and ts[-1] == 0
    with pytest.raises(ValueError):
        make_timesteps(DDIMConfig(timestep_spacing="bogus"), 10)
    with pytest.raises(ValueError):
        make_timesteps(DDIMConfig(), 0)


def test_clip_sample_config():
    sched = make_schedule(DDIMConfig(prediction_type="epsilon", clip_sample=True))
    x = jnp.full((1, 2, 2, 4), 10.0)
    eps = jnp.zeros((1, 2, 2, 4))
    x0 = pred_original(sched, eps, jnp.asarray(500), x)
    assert float(jnp.max(jnp.abs(x0))) <= 1.0 + 1e-6
