"""Optimizer groups: two learning rates over the {latents, affine} pytree."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from depth_completion_tpu.guidance.optim import make_optimizer


def _step(opt, params, grads):
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    return optax.apply_updates(params, updates)


def test_sgd_group_learning_rates():
    params = {
        "latents": jnp.zeros((2, 4, 4, 4)),
        "affine": {"scale": jnp.zeros((2, 1, 1, 1)), "shift": jnp.zeros((2, 1, 1, 1))},
    }
    grads = {
        "latents": jnp.ones((2, 4, 4, 4)),
        "affine": {"scale": jnp.ones((2, 1, 1, 1)), "shift": jnp.ones((2, 1, 1, 1))},
    }
    opt = make_optimizer("sgd", lr_latent=0.1, lr_scaling=0.01)
    new = _step(opt, params, grads)
    np.testing.assert_allclose(np.asarray(new["latents"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new["affine"]["scale"]), -0.01, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new["affine"]["shift"]), -0.01, rtol=1e-6)


def test_adam_first_step_magnitude():
    """torch-default Adam: first step ≈ lr (bias-corrected m̂/√v̂ = sign(g))."""
    params = {"latents": jnp.zeros((1, 2, 2, 4))}
    grads = {"latents": jnp.full((1, 2, 2, 4), 3.0)}
    opt = make_optimizer("adam", lr_latent=0.05)
    new = _step(opt, params, grads)
    np.testing.assert_allclose(np.asarray(new["latents"]), -0.05, rtol=1e-4)


def test_adagrad_matches_torch_semantics():
    """torch Adagrad (zero initial accumulator): step = lr·g/(√(g²)+eps)."""
    import torch

    g = 2.5
    p_t = torch.zeros(3, requires_grad=True)
    opt_t = torch.optim.Adagrad([p_t], lr=0.1)
    p_t.grad = torch.full((3,), g)
    opt_t.step()

    params = {"latents": jnp.zeros((3,))}
    grads = {"latents": jnp.full((3,), g)}
    opt = make_optimizer("adagrad", lr_latent=0.1)
    new = _step(opt, params, grads)
    np.testing.assert_allclose(
        np.asarray(new["latents"]), p_t.detach().numpy(), rtol=1e-5
    )


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        make_optimizer("rmsprop")


@pytest.mark.parametrize("opt_name", ["adam", "sgd", "adagrad"])
def test_multistep_trajectory_matches_torch(opt_name):
    """20-step trajectory equivalence vs torch on an identical injected
    gradient sequence — both parameter groups, torch-default
    hyperparameters. This isolates exact optimizer-state parity
    (moments, bias correction, accumulators) where the e2e pipeline
    parity test (test_pipeline_parity.py) can only bound statistically:
    there the ε-rescale amplifies fp32 network-backward noise, here the
    gradients are bit-identical on both sides."""
    import torch

    rng = np.random.default_rng(5)
    lat0 = rng.standard_normal((2, 3, 4, 1)).astype(np.float32)
    sc0 = rng.standard_normal((2, 1, 1, 1)).astype(np.float32)
    grad_seq = [
        (
            rng.standard_normal((2, 3, 4, 1)).astype(np.float32),
            rng.standard_normal((2, 1, 1, 1)).astype(np.float32),
        )
        for _ in range(20)
    ]

    # torch reference (reference marigold_dc.py:774-789 group structure)
    p_lat = torch.nn.Parameter(torch.from_numpy(lat0.copy()))
    p_sc = torch.nn.Parameter(torch.from_numpy(sc0.copy()))
    groups = [
        {"params": [p_lat], "lr": 0.05},
        {"params": [p_sc], "lr": 0.005},
    ]
    topt = {
        "adam": torch.optim.Adam,
        "sgd": torch.optim.SGD,
        "adagrad": torch.optim.Adagrad,
    }[opt_name](groups)
    for g_lat, g_sc in grad_seq:
        topt.zero_grad()
        p_lat.grad = torch.from_numpy(g_lat.copy())
        p_sc.grad = torch.from_numpy(g_sc.copy())
        topt.step()

    # ours
    params = {
        "latents": jnp.asarray(lat0),
        "affine": {"scale": jnp.asarray(sc0)},
    }
    opt = make_optimizer(opt_name, lr_latent=0.05, lr_scaling=0.005)
    state = opt.init(params)
    for g_lat, g_sc in grad_seq:
        grads = {
            "latents": jnp.asarray(g_lat),
            "affine": {"scale": jnp.asarray(g_sc)},
        }
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    # fp32 noise between the equivalent bias-correction formulations
    # (optax folds 1/(1−β₁ᵗ) into m̂; torch scales the step size) reaches
    # ~5e-6 after 20 steps — tolerance sits just above that.
    np.testing.assert_allclose(
        np.asarray(params["latents"]), p_lat.detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(params["affine"]["scale"]), p_sc.detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )
