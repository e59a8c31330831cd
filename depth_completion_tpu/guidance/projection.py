"""Depth-space projections and sparse-depth normalization.

Reimplements the reference's projection/normalization machinery as pure
functions (reference marigold_dc.py:23-50,706-756 for the forward direction,
:842-860 for the in-loop round trip back to guidance space):

1. per-sample depth range from the sparse map (const | minmax | percentile)
2. clamp to the range, project (linear | log | log10, optionally inverted)
3. affine-normalize to [0, 1]

All tensors are NHWC with a single channel for depth.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from depth_completion_tpu.ops.stats import masked_minmax, masked_quantile

EPSILON = 1e-7  # reference marigold_dc.py:20


def project(x: jnp.ndarray, projection: str, inv: bool) -> jnp.ndarray:
    """Apply the depth projection (log/log10/linear, then optional 1/x)."""
    if projection == "log":
        x = jnp.log(x)
    elif projection == "log10":
        x = jnp.log10(x)
    elif projection != "linear":
        raise ValueError(f"Unknown projection method: {projection}")
    if inv:
        x = 1.0 / x
    return x


@dataclasses.dataclass(frozen=True)
class DepthNormalization:
    """Per-sample normalization state carried through the sampling loop.

    ``min/max_depths`` are the clamped metric range; ``min/max_proj`` the
    projected range used to map to/from [0,1] guidance space. All [N,1,1,1].
    """

    sparses_normed: jnp.ndarray  # [N, H, W, 1] in [0, 1]
    masks: jnp.ndarray  # [N, H, W, 1] bool
    min_depths: jnp.ndarray  # [N, 1, 1, 1]
    max_depths: jnp.ndarray  # [N, 1, 1, 1]
    min_proj: jnp.ndarray  # [N, 1, 1, 1]
    max_proj: jnp.ndarray  # [N, 1, 1, 1]
    any_valid: jnp.ndarray  # [N] bool — False rows had no sparse points


def normalize_sparse(
    sparses: jnp.ndarray,
    *,
    norm: str,
    projection: str,
    inv: bool,
    min_depth: float,
    max_depth: float,
    percentile: tuple[float, float] = (0.01, 0.99),
) -> DepthNormalization:
    """Range-estimate, clamp, project, and [0,1]-normalize sparse depth.

    Semantics per the reference (marigold_dc.py:706-756):
    - mask = sparse > 0
    - range: minmax → masked min/max; percentile → per-sample quantiles of the
      masked values; const → (min_depth, max_depth)
    - sparse clamped to the *unclamped* estimated range, then for
      minmax/percentile the range itself is clamped into
      [min_depth, max_depth] before projection
    - projection applied to range and values; ``inv`` swaps and reciprocates
      the range bounds
    """
    if sparses.ndim != 4 or sparses.shape[-1] != 1:
        raise ValueError(f"sparses must be [N,H,W,1], got {sparses.shape}")
    n = sparses.shape[0]
    sparses = sparses.astype(jnp.float32)
    masks = sparses > 0
    flat = sparses.reshape(n, -1)
    flat_mask = masks.reshape(n, -1)

    if norm == "minmax":
        mins, maxs, any_valid = masked_minmax(flat, flat_mask, axis=-1)
    elif norm == "percentile":
        qs = jnp.asarray(percentile, dtype=jnp.float32)
        ranges = masked_quantile(flat, flat_mask, qs)  # [N, 2]
        mins, maxs = ranges[:, 0], ranges[:, 1]
        any_valid = jnp.any(flat_mask, axis=-1)
    elif norm == "const":
        mins = jnp.full((n,), min_depth, dtype=jnp.float32)
        maxs = jnp.full((n,), max_depth, dtype=jnp.float32)
        any_valid = jnp.any(flat_mask, axis=-1)
    else:
        raise ValueError(f"Unknown norm method: {norm}")

    mins = mins.reshape(n, 1, 1, 1)
    maxs = maxs.reshape(n, 1, 1, 1)

    sparses_clamped = jnp.clip(sparses, mins, maxs)
    if norm in ("minmax", "percentile"):
        mins = jnp.maximum(mins, min_depth)
        maxs = jnp.minimum(maxs, max_depth)

    min_proj = project(mins, projection, inv=False)
    max_proj = project(maxs, projection, inv=False)
    sparses_proj = project(sparses_clamped, projection, inv=False)
    if inv:
        min_proj, max_proj = 1.0 / max_proj, 1.0 / min_proj
        sparses_proj = 1.0 / sparses_proj

    sparses_normed = (sparses_proj - min_proj) / (max_proj - min_proj)
    return DepthNormalization(
        sparses_normed=sparses_normed,
        masks=masks,
        min_depths=mins,
        max_depths=maxs,
        min_proj=min_proj,
        max_proj=max_proj,
        any_valid=any_valid,
    )


def renormalize_to_guidance(
    denses_normed: jnp.ndarray,
    dn: DepthNormalization,
    projection: str,
    inv: bool,
) -> jnp.ndarray:
    """Map a [0,1] *linear*-space dense prediction into guidance space.

    The decode head produces depth normalized against the metric range; when a
    non-linear projection (or inversion) is active, the loss is computed in
    projected space, so the prediction is de-normalized to metric, projected,
    and re-normalized against the projected range — the round trip at
    reference marigold_dc.py:842-860.
    """
    if projection == "linear" and not inv:
        return denses_normed
    metric = denses_normed * (dn.max_depths - dn.min_depths) + dn.min_depths
    proj = project(metric, projection, inv=False)
    if inv:
        proj = 1.0 / proj
    return (proj - dn.min_proj) / (dn.max_proj - dn.min_proj)


def denormalize_depth(denses_normed: jnp.ndarray, dn: DepthNormalization) -> jnp.ndarray:
    """[0,1] → metric depth (final output, reference marigold_dc.py:984)."""
    return denses_normed * (dn.max_depths - dn.min_depths) + dn.min_depths
