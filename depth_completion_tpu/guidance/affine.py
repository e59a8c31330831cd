"""Affine (scale/shift) alignment of affine-invariant depth to sparse anchors.

Two solvers, as in the reference:

- closed form (reference marigold_dc.py:53-128): masked least squares,
  scale = cov(affine, guide)/var(affine), shift = mean(guide) − scale·mean.
- learned (reference marigold_dc.py:284-336): trainable (scale, shift) with
  positivity via squaring — metric = scale²·(max−min)·affine + shift²·min,
  where (min, max) are the masked min/max of the guide.

Everything is batched [N,H,W,1] and jit-safe. Where the reference raises on
an all-empty mask (marigold_dc.py:97-98) we clamp the denominator and let the
caller use the ``any_valid`` flag from normalization to surface errors.
"""

from __future__ import annotations

import jax.numpy as jnp

from depth_completion_tpu.ops.stats import masked_minmax

EPSILON = 1e-7  # reference marigold_dc.py:20


def compute_affine_params(
    affines: jnp.ndarray, guides: jnp.ndarray, masks: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked least-squares (scale, shift) per sample.

    Args: affines/guides [N,H,W,1], masks [N,H,W,1] bool.
    Returns: (scales [N], shifts [N]) float32.
    """
    n = affines.shape[0]
    a = affines.reshape(n, -1).astype(jnp.float32)
    g = guides.reshape(n, -1).astype(jnp.float32)
    m = masks.reshape(n, -1).astype(jnp.float32)

    num_valid = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    a_mean = jnp.sum(a * m, axis=1, keepdims=True) / num_valid
    g_mean = jnp.sum(g * m, axis=1, keepdims=True) / num_valid
    a_c = (a - a_mean) * m
    g_c = (g - g_mean) * m
    var = jnp.sum(jnp.square(a_c), axis=1, keepdims=True)
    cov = jnp.sum(a_c * g_c, axis=1, keepdims=True)
    scales = cov / (var + EPSILON)
    shifts = g_mean - scales * a_mean
    return scales[:, 0], shifts[:, 0]


def affine_to_metric_closed_form(
    affines: jnp.ndarray, guides: jnp.ndarray, masks: jnp.ndarray
) -> jnp.ndarray:
    """scale·affine + shift with closed-form per-sample parameters."""
    n = affines.shape[0]
    scales, shifts = compute_affine_params(affines, guides, masks)
    scales = scales.reshape(n, 1, 1, 1)
    shifts = shifts.reshape(n, 1, 1, 1)
    return scales * affines + shifts


def affine_to_metric_learned(
    affines: jnp.ndarray,
    guides: jnp.ndarray,
    masks: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
) -> jnp.ndarray:
    """scale²·(max−min)·affine + shift²·min with learned [N,1,1,1] params.

    (min, max) are masked min/max of the guide per sample — the learned
    branch of reference marigold_dc.py:323-331. Squaring keeps the effective
    scale/offset non-negative without constraints.
    """
    n = affines.shape[0]
    mins, maxs, _ = masked_minmax(
        guides.reshape(n, -1), masks.reshape(n, -1), axis=-1
    )
    mins = mins.reshape(n, 1, 1, 1)
    maxs = maxs.reshape(n, 1, 1, 1)
    return jnp.square(scale) * (maxs - mins) * affines + jnp.square(shift) * mins
