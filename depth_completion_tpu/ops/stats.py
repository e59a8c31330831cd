"""Masked statistics kernels — jit-safe equivalents of the reference's
torch helpers.

- ``masked_minmax``: ±inf substitution (reference utils.py:89-138). The
  reference raises when a row has no valid point; under jit we instead return
  an ``any_valid`` flag per row so callers can surface the error host-side.
- ``masked_quantile``: batched replacement for the reference's per-sample
  ``torch.quantile`` Python loop (reference marigold_dc.py:714-726) — one
  sort per row with invalid entries pushed to +inf, then linear interpolation
  at q·(n_valid−1). Static shapes, fully vectorized.
- ``kld_stdnorm``: simple/strict KL-to-N(0,1) (reference utils.py:28-86).
- ``masked_mae`` / ``masked_rmse``: evaluation metrics (reference
  utils.py:692-739) in a jit-safe masked-mean form.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_minmax(
    x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Min/max of ``x`` over ``axis`` where ``mask`` is True.

    Returns ``(mins, maxs, any_valid)``. Rows with no valid entry yield
    (+inf, -inf) and ``any_valid=False`` — callers decide whether that is an
    error (the reference raises, utils.py:132-136) or a skip.
    """
    if x.shape != mask.shape:
        raise ValueError(f"x shape {x.shape} != mask shape {mask.shape}")
    inf = jnp.asarray(jnp.inf, dtype=x.dtype)
    mins = jnp.min(jnp.where(mask, x, inf), axis=axis)
    maxs = jnp.max(jnp.where(mask, x, -inf), axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    return mins, maxs, any_valid


def masked_quantile(
    x: jnp.ndarray, mask: jnp.ndarray, qs: jnp.ndarray
) -> jnp.ndarray:
    """Per-row quantiles of masked entries with linear interpolation.

    Args:
        x:    [N, M] values.
        mask: [N, M] boolean validity.
        qs:   [Q] quantiles in [0, 1].

    Returns:
        [N, Q] quantile values. Matches ``torch.quantile(x[mask], q)``
        per row (linear interpolation) when the row has ≥1 valid entry.
    """
    if x.ndim != 2 or x.shape != mask.shape:
        raise ValueError(f"expected matching 2-D x/mask, got {x.shape} / {mask.shape}")
    x = x.astype(jnp.float32)
    n_valid = jnp.sum(mask, axis=-1).astype(jnp.float32)  # [N]
    # Invalid entries sort to the end.
    sorted_x = jnp.sort(jnp.where(mask, x, jnp.inf), axis=-1)  # [N, M]
    # Fractional index into the valid prefix.
    pos = qs[None, :] * jnp.maximum(n_valid[:, None] - 1.0, 0.0)  # [N, Q]
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    take = lambda idx: jnp.take_along_axis(sorted_x, idx, axis=-1)  # noqa: E731
    return take(lo) * (1.0 - frac) + take(hi) * frac  # [N, Q]


def kld_stdnorm(
    x: jnp.ndarray, reduction: str = "mean", mode: str = "simple"
) -> jnp.ndarray:
    """KL divergence of ``x`` (flattened per sample) from N(0, 1).

    ``simple`` = mean(x²); ``strict`` = 0.5·(μ² + σ² − log σ² − 1) with the
    biased variance, matching the reference (utils.py:69-86).
    """
    n = x.shape[0]
    flat = x.reshape(n, -1).astype(jnp.float32)
    if mode == "simple":
        dist = jnp.mean(jnp.square(flat), axis=-1)
    elif mode == "strict":
        mu = jnp.mean(flat, axis=-1)
        var = jnp.var(flat, axis=-1)
        eps = jnp.finfo(jnp.float32).eps
        dist = 0.5 * (jnp.square(mu) + var - jnp.log(var + eps) - 1.0)
    else:
        raise ValueError(f"Unknown mode: {mode}")
    if reduction == "mean":
        return jnp.mean(dist)
    if reduction == "sum":
        return jnp.sum(dist)
    if reduction == "none":
        return dist
    raise ValueError(f"Unknown reduction: {reduction}")


def masked_mae(
    preds: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Mean absolute error over masked entries (reference utils.py:692-714)."""
    err = jnp.abs(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    if mask is None:
        return jnp.mean(err)
    m = mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_rmse(
    preds: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Root mean squared error over masked entries (reference utils.py:717-739)."""
    err = jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    if mask is None:
        return jnp.sqrt(jnp.mean(err))
    m = mask.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0))
