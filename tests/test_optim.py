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
