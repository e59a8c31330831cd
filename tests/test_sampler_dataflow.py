"""The exact-dataflow contract of the guided step (SURVEY.md §3.2).

Manually replays ONE per-step-training iteration outside the scan — UNet on
the pre-update latent, Tweedie preview in-graph, grad of the summed loss,
per-sample ε-norm rescale, Adam update, DDIM transition with the OLD ε̂ on
the UPDATED latent, final closed-form decode — and requires bit-level
agreement with `guided_sample(steps=1)`. Any reordering of the reference
dataflow (marigold_dc.py:791-909) breaks this test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from depth_completion_tpu.guidance.optim import make_optimizer
from depth_completion_tpu.models.bundle import make_random_bundle
from depth_completion_tpu.pipeline.sampler import (
    SamplerConfig,
    _guidance_loss,
    _prepare,
    guided_sample,
    latent_to_affine,
)
from depth_completion_tpu.guidance.affine import affine_to_metric_closed_form
from depth_completion_tpu.guidance.projection import denormalize_depth
from depth_completion_tpu.sched.ddim import (
    ddim_step,
    make_schedule,
    make_timesteps,
    pred_epsilon,
    pred_original,
)

EPSILON = 1e-7


def test_one_step_manual_replay_matches_scan():
    bundle = make_random_bundle(seed=0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, size=(2, 48, 64, 3)).astype(np.float32)
    )
    sparse_np = np.zeros((2, 48, 64, 1), np.float32)
    mask = rng.random((2, 48, 64, 1)) < 0.05
    sparse_np[mask] = rng.uniform(2.0, 80.0, mask.sum()).astype(np.float32)
    sparses = jnp.asarray(sparse_np)

    cfg = SamplerConfig(
        steps=1, resolution=64, closed_form=True, train_latents=True,
        max_depth=120.0, flash_attention="off",
    )

    # --- the scan path -----------------------------------------------------
    denses_scan, latents_scan = jax.jit(
        guided_sample, static_argnames=("cfg",)
    )(bundle, images, sparses, cfg)

    # --- manual replay -----------------------------------------------------
    def manual(bundle, images, sparses):
        sched = make_schedule(cfg.ddim)
        key = jax.random.PRNGKey(cfg.seed)
        _, noise_key = jax.random.split(key)
        img_latents, pred_latents, dn, padding, orig_res = _prepare(
            bundle, images, sparses, cfg, None, noise_key
        )
        t = jnp.asarray(int(make_timesteps(cfg.ddim, 1)[0]))
        n = images.shape[0]

        def unet_eps(lat):
            x = jnp.concatenate([img_latents, lat.astype(img_latents.dtype)], axis=-1)
            ctx = jnp.broadcast_to(
                bundle.text_context, (n,) + bundle.text_context.shape[1:]
            )
            from depth_completion_tpu.models.unet import apply_unet

            return apply_unet(
                bundle.unet_params, x, t, ctx, bundle.unet_config,
                remat=False,
            )

        params = {"latents": pred_latents}
        opt = make_optimizer(cfg.opt, cfg.lr_latent, cfg.lr_scaling)
        opt_state = opt.init(params)

        def loss_fn(p):
            lat = p["latents"]
            out = unet_eps(lat)
            x0 = pred_original(sched, out, t, lat)
            losses = _guidance_loss(
                bundle, cfg, dn, images, orig_res, padding, True, x0, None, lat
            )
            return jnp.sum(losses), out

        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        eps_ref = pred_epsilon(sched, out, t, params["latents"])
        eps_norm = jnp.linalg.norm(eps_ref.reshape(n, -1).astype(jnp.float32), axis=1)
        g = grads["latents"].astype(jnp.float32)
        g_norm = jnp.linalg.norm(g.reshape(n, -1), axis=1)
        grads["latents"] = g * (
            eps_norm / jnp.maximum(g_norm, EPSILON)
        ).reshape(n, 1, 1, 1)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_lat, _ = ddim_step(sched, out, t, params["latents"], cfg.steps)

        affines = latent_to_affine(bundle, new_lat, orig_res, padding, cfg.interp_mode)
        denses_normed = jnp.clip(
            affine_to_metric_closed_form(affines, dn.sparses_normed, dn.masks),
            0.0,
            1.0,
        )
        return denormalize_depth(denses_normed, dn), new_lat

    denses_manual, latents_manual = jax.jit(manual)(bundle, images, sparses)

    np.testing.assert_allclose(
        np.asarray(latents_scan), np.asarray(latents_manual), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(denses_scan), np.asarray(denses_manual), rtol=1e-4, atol=1e-4
    )


def test_three_step_manual_replay_matches_scan():
    """Carry threading across steps: the optimizer state must persist (one
    optimizer for the whole loop, reference marigold_dc.py:774-789) and the
    timesteps must be walked in trailing order. A one-step replay cannot
    distinguish a scan that re-initializes Adam state (or mis-orders t)
    from the correct carry; three chained manual iterations can."""
    bundle = make_random_bundle(seed=0)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.uniform(0, 255, size=(2, 48, 64, 3)).astype(np.float32)
    )
    sparse_np = np.zeros((2, 48, 64, 1), np.float32)
    mask = rng.random((2, 48, 64, 1)) < 0.05
    sparse_np[mask] = rng.uniform(2.0, 80.0, mask.sum()).astype(np.float32)
    sparses = jnp.asarray(sparse_np)

    steps = 3
    cfg = SamplerConfig(
        steps=steps, resolution=64, closed_form=True, train_latents=True,
        max_depth=120.0, flash_attention="off",
    )

    denses_scan, latents_scan = jax.jit(
        guided_sample, static_argnames=("cfg",)
    )(bundle, images, sparses, cfg)

    def manual(bundle, images, sparses):
        sched = make_schedule(cfg.ddim)
        key = jax.random.PRNGKey(cfg.seed)
        _, noise_key = jax.random.split(key)
        img_latents, pred_latents, dn, padding, orig_res = _prepare(
            bundle, images, sparses, cfg, None, noise_key
        )
        ts = [int(t) for t in make_timesteps(cfg.ddim, steps)]
        n = images.shape[0]

        def unet_eps(lat, t):
            x = jnp.concatenate(
                [img_latents, lat.astype(img_latents.dtype)], axis=-1
            )
            ctx = jnp.broadcast_to(
                bundle.text_context, (n,) + bundle.text_context.shape[1:]
            )
            from depth_completion_tpu.models.unet import apply_unet

            return apply_unet(
                bundle.unet_params, x, t, ctx, bundle.unet_config,
                remat=False,
            )

        params = {"latents": pred_latents}
        opt = make_optimizer(cfg.opt, cfg.lr_latent, cfg.lr_scaling)
        opt_state = opt.init(params)  # ONE init for all steps

        for t_int in ts:
            t = jnp.asarray(t_int)

            def loss_fn(p, t=t):
                lat = p["latents"]
                out = unet_eps(lat, t)
                x0 = pred_original(sched, out, t, lat)
                losses = _guidance_loss(
                    bundle, cfg, dn, images, orig_res, padding, True, x0,
                    None, lat,
                )
                return jnp.sum(losses), out

            (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            eps_ref = pred_epsilon(sched, out, t, params["latents"])
            eps_norm = jnp.linalg.norm(
                eps_ref.reshape(n, -1).astype(jnp.float32), axis=1
            )
            g = grads["latents"].astype(jnp.float32)
            g_norm = jnp.linalg.norm(g.reshape(n, -1), axis=1)
            grads["latents"] = g * (
                eps_norm / jnp.maximum(g_norm, EPSILON)
            ).reshape(n, 1, 1, 1)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_lat, _ = ddim_step(sched, out, t, params["latents"], steps)
            params = {"latents": new_lat}

        affines = latent_to_affine(
            bundle, params["latents"], orig_res, padding, cfg.interp_mode
        )
        denses_normed = jnp.clip(
            affine_to_metric_closed_form(affines, dn.sparses_normed, dn.masks),
            0.0,
            1.0,
        )
        return denormalize_depth(denses_normed, dn), params["latents"]

    denses_manual, latents_manual = jax.jit(manual)(bundle, images, sparses)

    np.testing.assert_allclose(
        np.asarray(latents_scan), np.asarray(latents_manual),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(denses_scan), np.asarray(denses_manual),
        rtol=1e-4, atol=1e-4,
    )
