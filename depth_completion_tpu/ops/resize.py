"""Differentiable image resizing and padding bookkeeping.

TPU-native replacement for the reference's image-processor geometry
(diffusers ``MarigoldImageProcessor`` used at reference marigold_dc.py:687-693
and :366-370): longest-side resize to the processing resolution, replicate-pad
to a multiple of 16, and antialiased resize back to the original resolution.

The resize sits on the guidance gradient path (latent → decode → unpad →
resize → loss, reference marigold_dc.py:828-840), so it must be
differentiable: ``jax.image.resize`` with ``antialias=True`` gives a linear
(hence trivially differentiable) scaled-kernel resampler equivalent to
torch's ``interpolate(..., antialias=True)`` up to filter-tap details.

Layout note: all image tensors in this framework are NHWC (TPU-friendly;
channels on the 128-lane minor dimension), unlike the reference's NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LATENT_ALIGN = 16  # spatial alignment of the VAE input (8× downsample + UNet /2)


def resize_antialias(
    x: jnp.ndarray, size: tuple[int, int], method: str = "bilinear"
) -> jnp.ndarray:
    """Resize NHWC ``x`` to ``size=(H, W)`` with antialiasing.

    ``method`` ∈ {"bilinear", "bicubic", "nearest"} mirroring the reference's
    interp-mode flag (reference predict.py:200-206).
    """
    n, _, _, c = x.shape
    h, w = size
    if method == "nearest":
        return jax.image.resize(x, (n, h, w, c), method="nearest")
    jax_method = {"bilinear": "linear", "bicubic": "cubic"}.get(method)
    if jax_method is None:
        raise ValueError(f"Unknown interpolation method: {method}")
    orig_dtype = x.dtype
    out = jax.image.resize(
        x.astype(jnp.float32), (n, h, w, c), method=jax_method, antialias=True
    )
    return out.astype(orig_dtype)


def resize_to_max_edge(
    x: jnp.ndarray, max_edge: int, method: str = "bilinear"
) -> jnp.ndarray:
    """Resize NHWC ``x`` so the longer spatial side equals ``max_edge``.

    Matches the reference's processing-resolution semantics
    (reference predict.py:61-68, marigold_dc.py:596-597): the target shape is
    ``(res*H//max(H,W), res*W//max(H,W))`` — floor division, aspect preserved.
    """
    _, h, w, _ = x.shape
    m = max(h, w)
    new_h = max_edge * h // m
    new_w = max_edge * w // m
    return resize_antialias(x, (new_h, new_w), method=method)


def pad_to_multiple(
    x: jnp.ndarray, align: int = LATENT_ALIGN
) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Replicate-pad NHWC bottom/right to a multiple of ``align``.

    Returns ``(padded, (ph, pw))`` — the padding pair that ``unpad`` (and the
    decode head) must strip, mirroring the image processor's
    preprocess/unpad_image contract (reference marigold_dc.py:366-370,687-693).
    """
    _, h, w, _ = x.shape
    ph = -h % align
    pw = -w % align
    if ph == 0 and pw == 0:
        return x, (0, 0)
    padded = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return padded, (ph, pw)


def unpad(x: jnp.ndarray, padding: tuple[int, int]) -> jnp.ndarray:
    """Strip bottom/right padding added by ``pad_to_multiple``."""
    ph, pw = padding
    h = x.shape[1] - ph
    w = x.shape[2] - pw
    return x[:, :h, :w, :]


def processing_size(orig_res: tuple[int, int], resolution: int) -> tuple[int, int]:
    """(PPH, PPW): padded processing resolution for an input of ``orig_res``.

    Longest side floor-scaled to ``resolution``, then aligned up to ×16.
    """
    h, w = orig_res
    m = max(h, w)
    rh, rw = resolution * h // m, resolution * w // m
    return rh + (-rh % LATENT_ALIGN), rw + (-rw % LATENT_ALIGN)


def latent_size(
    orig_res: tuple[int, int], resolution: int, downsample: int = 8
) -> tuple[int, int]:
    """(EH, EW): actual latent geometry = padded processing size / downsample.

    ``downsample`` is the VAE's spatial factor (8 for SD-class VAEs; smaller
    for scaled-down test configs). Deliberate deviation: the reference
    validates temporal-prior latents against ``res·H//(8·max(H,W))``
    (reference marigold_dc.py:596-597), which disagrees with the true VAE
    output height whenever the resized side is not a multiple of 16 (e.g.
    KITTI 352×1216 at res 768 → formula 27, actual 28). We use the true
    geometry everywhere.
    """
    pph, ppw = processing_size(orig_res, resolution)
    return pph // downsample, ppw // downsample
