"""Image preprocessing: range scaling, longest-side resize, ×16 padding.

Capability match for the image-processor stage the reference drives at
marigold_dc.py:687-693 (resize to processing resolution, pad, remember
padding + original resolution) with the [-1, 1] pixel range the VAE expects.
All NHWC; geometry helpers live in ops/resize.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from depth_completion_tpu.ops.resize import (
    pad_to_multiple,
    resize_to_max_edge,
)


def preprocess_images(
    images: jnp.ndarray, resolution: int, interp_mode: str = "bilinear"
) -> tuple[jnp.ndarray, tuple[int, int], tuple[int, int]]:
    """Raw [N,H,W,C] images (0..255) → ([N,PPH,PPW,C] in [-1,1], padding, orig_res).

    Matches the reference preprocess contract: resize longest side to
    ``resolution`` (antialiased), replicate-pad bottom/right to ×16, return
    the padding amounts and original resolution for the decode head.
    """
    n, h, w, c = images.shape
    x = images.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    x = resize_to_max_edge(x, resolution, method=interp_mode)
    x, padding = pad_to_multiple(x)
    return x, padding, (h, w)
