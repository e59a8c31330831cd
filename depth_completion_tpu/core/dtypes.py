"""Dtype policy: bf16 params/compute, fp32 reductions and scheduler math.

The reference runs bf16 end-to-end by default with TF32 matmuls enabled
(reference predict.py:168-175,21-22,463-466).  On TPU the natural analogue is
bfloat16 model compute on the MXU with float32 accumulation (XLA does fp32
accumulation for bf16 matmuls natively) and float32 for numerically sensitive
scalar paths: DDIM ᾱ tables, normalization statistics, losses, and optimizer
state.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Precision policy threaded through models and the sampling loop."""

    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Reductions, scheduler tables, losses, optimizer state.
    reduce_dtype: jnp.dtype = jnp.float32

    @property
    def is_full_precision(self) -> bool:
        return self.compute_dtype == jnp.float32


_POLICIES = {
    "bf16": DTypePolicy(),
    "fp32": DTypePolicy(
        param_dtype=jnp.float32, compute_dtype=jnp.float32, reduce_dtype=jnp.float32
    ),
}


def resolve_policy(precision: str) -> DTypePolicy:
    """Map a CLI precision string ("bf16" | "fp32") to a DTypePolicy.

    Mirrors the reference's precision flag (reference predict.py:168-175).
    """
    try:
        return _POLICIES[precision]
    except KeyError:
        raise ValueError(
            f"Unknown precision: {precision!r} (must be one of {sorted(_POLICIES)})"
        ) from None
