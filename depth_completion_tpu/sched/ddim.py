"""DDIM sampling as pure functions over a precomputed ᾱ table.

The reference drives denoising with diffusers' ``DDIMScheduler`` rebuilt with
``timestep_spacing="trailing"`` (reference predict.py:490-494) and consumes
``step(noise, t, sample)`` → ``prev_sample`` / ``pred_original_sample``
(Tweedie preview) plus the raw ``alphas_cumprod`` table
(reference marigold_dc.py:800-826,899-909).

Here the schedule is a static float32 table and each step is a pure function
of ``(table, model_out, t, sample)`` so the whole 50-step loop lives inside a
single ``lax.scan``: timesteps are a static int32 vector scanned over, ᾱ
values are dynamic gathers from the table, and η=0 makes the step fully
deterministic (no per-step RNG in the carry).

Marigold's SD2-derived scheduler config uses scaled_linear betas over 1000
train steps and v-prediction; the reference's ε-reference for gradient
rescaling, ``√ᾱ·out + √(1−ᾱ)·x_t`` (reference marigold_dc.py:812-818), is
exactly the v→ε conversion, confirming the v-prediction contract.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    """Schedule hyperparameters (diffusers-compatible semantics)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # "linear" | "scaled_linear" | "squaredcos"
    prediction_type: str = "v_prediction"  # "epsilon" | "sample" | "v_prediction"
    timestep_spacing: str = "trailing"  # "trailing" | "leading" | "linspace"
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    clip_sample: bool = False
    clip_sample_range: float = 1.0


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Device-resident schedule state consumed inside jit.

    ``alphas_cumprod`` is kept float32 regardless of model compute dtype —
    the ᾱ ratios near t=0 lose precision in bf16.
    """

    alphas_cumprod: jnp.ndarray  # [T] float32
    final_alpha_cumprod: jnp.ndarray  # scalar float32 (ᾱ for "t = -1")
    config: DDIMConfig

    def alpha_at(self, t: jnp.ndarray) -> jnp.ndarray:
        """ᾱ_t with t = -1 (or any negative) mapping to final_alpha_cumprod."""
        safe_t = jnp.clip(t, 0, self.config.num_train_timesteps - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe_t], self.final_alpha_cumprod)


def make_schedule(config: DDIMConfig = DDIMConfig()) -> DiffusionSchedule:
    """Precompute the ᾱ table on host (numpy) once per config."""
    T = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, T, dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                config.beta_start**0.5, config.beta_end**0.5, T, dtype=np.float64
            )
            ** 2
        )
    elif config.beta_schedule == "squaredcos":
        # squaredcos_cap_v2 (Nichol & Dhariwal cosine schedule)
        steps = np.arange(T + 1, dtype=np.float64) / T
        f = np.cos((steps + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.clip(1.0 - f[1:] / f[:-1], 0.0, 0.999)
    else:
        raise ValueError(f"Unknown beta schedule: {config.beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if config.set_alpha_to_one else alphas_cumprod[0]
    return DiffusionSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, dtype=jnp.float32),
        config=config,
    )


def make_timesteps(config: DDIMConfig, num_steps: int) -> np.ndarray:
    """Static descending int32 timestep vector for ``num_steps`` inference steps.

    "trailing" matches the reference's scheduler rebuild
    (reference predict.py:491-494): round(arange(T, 0, -T/steps)) - 1.
    """
    T = config.num_train_timesteps
    if num_steps < 1 or num_steps > T:
        raise ValueError(f"num_steps must be in [1, {T}], got {num_steps}")
    spacing = config.timestep_spacing
    if spacing == "trailing":
        step_ratio = T / num_steps
        ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.int32) - 1
    elif spacing == "leading":
        step_ratio = T // num_steps
        ts = (np.arange(num_steps) * step_ratio).round().astype(np.int32)[::-1]
        ts = ts + config.steps_offset
    elif spacing == "linspace":
        ts = np.linspace(0, T - 1, num_steps).round().astype(np.int32)[::-1]
    else:
        raise ValueError(f"Unknown timestep spacing: {spacing}")
    return np.ascontiguousarray(ts)


def pred_original(
    sched: DiffusionSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """Tweedie x̂₀ preview for the configured prediction type.

    This is the differentiable path of the guidance objective — gradients flow
    from the anchor loss through x̂₀ into both the UNet output and the latent
    (reference marigold_dc.py:820-826 keeps scheduler.step in-graph).
    """
    a_t = sched.alpha_at(t).astype(jnp.float32)
    sqrt_a = jnp.sqrt(a_t)
    sqrt_1ma = jnp.sqrt(1.0 - a_t)
    ptype = sched.config.prediction_type
    x = sample.astype(jnp.float32)
    out = model_out.astype(jnp.float32)
    if ptype == "epsilon":
        x0 = (x - sqrt_1ma * out) / sqrt_a
    elif ptype == "v_prediction":
        x0 = sqrt_a * x - sqrt_1ma * out
    elif ptype == "sample":
        x0 = out
    else:
        raise ValueError(f"Unknown prediction type: {ptype}")
    if sched.config.clip_sample:
        r = sched.config.clip_sample_range
        x0 = jnp.clip(x0, -r, r)
    return x0.astype(sample.dtype)


def pred_epsilon(
    sched: DiffusionSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """ε̂ implied by the model output (used for gradient-norm reference,
    reference marigold_dc.py:812-818)."""
    a_t = sched.alpha_at(t).astype(jnp.float32)
    sqrt_a = jnp.sqrt(a_t)
    sqrt_1ma = jnp.sqrt(1.0 - a_t)
    ptype = sched.config.prediction_type
    x = sample.astype(jnp.float32)
    out = model_out.astype(jnp.float32)
    if ptype == "epsilon":
        eps = out
    elif ptype == "v_prediction":
        eps = sqrt_a * out + sqrt_1ma * x
    elif ptype == "sample":
        eps = (x - sqrt_a * out) / sqrt_1ma
    else:
        raise ValueError(f"Unknown prediction type: {ptype}")
    return eps.astype(sample.dtype)


def ddim_step(
    sched: DiffusionSchedule,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    num_steps: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One deterministic (η=0) DDIM step.

    Returns ``(prev_sample, pred_original_sample)`` — the pair the reference
    consumes per hot-loop iteration (reference marigold_dc.py:820-826,899-909).
    ``t`` may be a traced scalar; ``num_steps`` must be static (it fixes the
    t → t_prev stride, T // num_steps, as in diffusers DDIM).
    """
    T = sched.config.num_train_timesteps
    prev_t = t - T // num_steps
    x0 = pred_original(sched, model_out, t, sample).astype(jnp.float32)
    eps = pred_epsilon(sched, model_out, t, sample).astype(jnp.float32)
    a_prev = sched.alpha_at(prev_t).astype(jnp.float32)
    prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
    return prev.astype(sample.dtype), x0.astype(sample.dtype)
