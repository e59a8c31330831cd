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
    ``k*i - 1`` with k = T // original_inference_steps; inference picks every
    (origin/steps)-th from the end, descending.
    """
    T = num_train_timesteps
    orig = config.original_inference_steps
    if num_steps > orig:
        raise ValueError(
            f"num_steps ({num_steps}) cannot exceed original_inference_steps ({orig})"
        )
    k = T // orig
    origin_ts = np.asarray(range(1, orig + 1), dtype=np.int64) * k - 1  # ascending
    skip = orig // num_steps
    ts = origin_ts[::-skip][:num_steps]  # descending from the last origin step
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
