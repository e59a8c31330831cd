"""Guidance loss library — per-sample anchor losses, differentiable under jit.

Reimplements reference marigold_dc.py:131-245: l1/l2 masked anchor losses,
edge (prediction-gradient vs gray-image-gradient), smooth (total variation),
plus the optional KLD-to-N(0,1) latent penalty. Every term is reduced
per-sample (batch dimension preserved), matching the reference's
``losses.backward(ones)`` per-sample gradient semantics
(marigold_dc.py:875-877): since samples are independent, grad-of-sum yields
per-sample gradients.

Layout: NHWC. ``loss_funcs`` is a static tuple — it selects which terms are
traced into the jitted graph.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp

SUPPORTED_LOSS_FUNCS = ("l1", "l2", "edge", "smooth")

# Rec. 601 luma weights, as the reference uses (marigold_dc.py:202-206).
_LUMA = (0.299, 0.587, 0.114)


def _to_gray(images: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] with C∈{1,3} → [N,H,W,1] luma."""
    c = images.shape[-1]
    if c == 3:
        r, g, b = images[..., 0:1], images[..., 1:2], images[..., 2:3]
        return _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b
    if c == 1:
        return images
    raise ValueError(f"Image must have 1 or 3 channels, got {c}")


def compute_loss(
    denses: jnp.ndarray,
    sparses: jnp.ndarray,
    masks: jnp.ndarray,
    loss_funcs: Sequence[str],
    images: jnp.ndarray | None = None,
    kld: bool = False,
    kld_weight: float = 0.1,
    kld_mode: str = "simple",
    pred_latents: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Combined per-sample guidance loss → [N] float32.

    Args:
        denses:  [N,H,W,1] dense prediction in guidance space.
        sparses: [N,H,W,1] normalized sparse anchors.
        masks:   [N,H,W,1] bool anchor validity.
        loss_funcs: static subset of SUPPORTED_LOSS_FUNCS.
        images:  [N,H,W,C] RGB/gray, required for edge/smooth.
        kld / kld_weight / kld_mode / pred_latents: optional latent prior.
    """
    if len(loss_funcs) == 0:
        raise ValueError("loss_funcs must contain at least one loss function")
    if kld and pred_latents is None:
        raise ValueError("pred_latents must be provided when kld is enabled")

    d = denses.astype(jnp.float32)
    s = sparses.astype(jnp.float32)
    m = masks.astype(jnp.float32)
    n = d.shape[0]
    num_valid = jnp.maximum(jnp.sum(m, axis=(1, 2, 3)), 1.0)
    total = jnp.zeros((n,), dtype=jnp.float32)

    for loss_func in loss_funcs:
        if loss_func == "l1":
            total += jnp.sum(jnp.abs(d - s) * m, axis=(1, 2, 3)) / num_valid
        elif loss_func == "l2":
            total += jnp.sum(jnp.square(d - s) * m, axis=(1, 2, 3)) / num_valid
        elif loss_func == "edge":
            if images is None:
                raise ValueError("images must be provided for edge loss")
            gray = _to_gray(images.astype(jnp.float32))
            gpx = jnp.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
            gpy = jnp.abs(d[:, :-1, :, :] - d[:, 1:, :, :])
            ggx = jnp.abs(gray[:, :, :-1, :] - gray[:, :, 1:, :])
            ggy = jnp.abs(gray[:, :-1, :, :] - gray[:, 1:, :, :])
            total += jnp.mean(jnp.abs(gpx - ggx), axis=(1, 2, 3))
            total += jnp.mean(jnp.abs(gpy - ggy), axis=(1, 2, 3))
        elif loss_func == "smooth":
            if images is None:
                # Parity with the reference, which requires images for
                # smooth even though it never uses them (marigold_dc.py:223-226).
                raise ValueError("images must be provided for smooth loss")
            total += jnp.mean(jnp.abs(d[:, :-1, :, :] - d[:, 1:, :, :]), axis=(1, 2, 3))
            total += jnp.mean(jnp.abs(d[:, :, :-1, :] - d[:, :, 1:, :]), axis=(1, 2, 3))
        else:
            raise ValueError(f"Unknown loss function: {loss_func}")

    if kld:
        from depth_completion_tpu.ops.stats import kld_stdnorm

        assert pred_latents is not None
        total += kld_weight * kld_stdnorm(pred_latents, reduction="none", mode=kld_mode)

    return total
