"""LCM (latent consistency) sampling step.

The reference's experimental ``--model=lcm`` path swaps in diffusers'
``LCMScheduler`` with trailing spacing and forces ``train_latents=False``
(reference predict.py:441-449,495-498) — guidance then happens only through
the closed-form affine alignment at decode time.

The LCM step rule: predict x̂₀, blend with the boundary-condition scalings
c_skip/c_out into a "denoised" estimate, then (except at the last step)
re-noise to the next timestep with fresh Gaussian noise. Unlike DDIM this is
stochastic, so the sampling scan carries an RNG key on this path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from depth_completion_tpu.sched.ddim import DiffusionSchedule, pred_original


@dataclasses.dataclass(frozen=True)
class LCMConfig:
    original_inference_steps: int = 50
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5


def make_lcm_timesteps(
    num_train_timesteps: int, num_steps: int, config: LCMConfig = LCMConfig()
) -> np.ndarray:
    """LCM timestep selection: subsample the distilled ("origin") schedule.

    The origin schedule places ``original_inference_steps`` points at
    ``k*i - 1`` with k = T // original_inference_steps (ascending). Inference
    follows diffusers' LCMScheduler.set_timesteps rule exactly: reverse the
    origin grid to descending order, then take (approximately) evenly spaced
    entries at indices ``floor(linspace(0, orig, num_steps, endpoint=False))``
    — NOT a fixed stride, which differs whenever orig/num_steps is fractional
    in the accumulated offset (e.g. num_steps=4 on a 50-point grid picks
    origin indices {49,37,24,12}, a stride-12 slice picks {49,37,25,13}).
    Matches the scheduler the reference swaps in at predict.py:495-498.
    """
    T = num_train_timesteps
    orig = config.original_inference_steps
    if num_steps > orig:
        raise ValueError(
            f"num_steps ({num_steps}) cannot exceed original_inference_steps ({orig})"
        )
    k = T // orig
    # Descending origin grid: k*orig - 1, k*(orig-1) - 1, ..., k - 1.
    origin_desc = np.arange(orig, 0, -1, dtype=np.int64) * k - 1
    idx = np.floor(np.linspace(0, orig, num=num_steps, endpoint=False)).astype(
        np.int64
    )
    ts = origin_desc[idx]
    return np.ascontiguousarray(ts.astype(np.int32))


def lcm_step(
    sched: DiffusionSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    rng: jax.Array,
    is_last: jnp.ndarray,
    config: LCMConfig = LCMConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One LCM step → (prev_sample, denoised).

    ``prev_t`` is the next (smaller) timestep in the inference schedule, or -1
    at the last step; ``is_last`` gates the re-noising.
    """
    a_t = sched.alpha_at(t).astype(jnp.float32)
    a_prev = sched.alpha_at(prev_t).astype(jnp.float32)

    # Boundary-condition scalings (consistency-model parameterization).
    scaled_t = t.astype(jnp.float32) * config.timestep_scaling
    sd2 = config.sigma_data**2
    c_skip = sd2 / (scaled_t**2 + sd2)
    c_out = scaled_t / jnp.sqrt(scaled_t**2 + sd2)

    x = sample.astype(jnp.float32)
    x0 = pred_original(sched, model_out, t, sample).astype(jnp.float32)
    denoised = c_out * x0 + c_skip * x

    noise = jax.random.normal(rng, sample.shape, dtype=jnp.float32)
    renoised = jnp.sqrt(a_prev) * denoised + jnp.sqrt(1.0 - a_prev) * noise
    prev = jnp.where(is_last, denoised, renoised)
    # keep a_t in the dependency graph for prediction types that use it via
    # pred_original; a_t itself is otherwise unused here
    del a_t
    return prev.astype(sample.dtype), denoised.astype(sample.dtype)
