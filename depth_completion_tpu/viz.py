"""Visualization: Spectral depth colormap and grid composition.

Host-side numpy equivalents of reference utils.py:370-432 (visualize_depth
via the Marigold "Spectral" colormap) and :973-1066 (make_grid). The Spectral
LUT is built once from matplotlib; images are [H,W,C] / [N,H,W,C] uint8 RGB.
"""

from __future__ import annotations

import numpy as np

_SPECTRAL_LUT: np.ndarray | None = None
_LUT_SIZE = 256


def _spectral_lut() -> np.ndarray:
    global _SPECTRAL_LUT
    if _SPECTRAL_LUT is None:
        import matplotlib

        cmap = matplotlib.colormaps["Spectral"]
        lut = cmap(np.linspace(0.0, 1.0, _LUT_SIZE))[:, :3]  # [256, 3] float
        _SPECTRAL_LUT = (lut * 255.0).round().astype(np.uint8)
    return _SPECTRAL_LUT


def visualize_depth(
    depth_maps: np.ndarray,
    max_depth: float,
    min_depth: float = 0.0,
    color_map: str = "Spectral",
) -> np.ndarray:
    """[N,H,W,1] metric depth → [N,H,W,3] uint8 colormapped RGB."""
    if min_depth >= max_depth:
        raise ValueError(f"Invalid values range: [{min_depth}, {max_depth}].")
    if depth_maps.ndim != 4 or depth_maps.shape[-1] != 1:
        raise ValueError(
            f"Input depth maps must have shape [N,H,W,1], got {depth_maps.shape}"
        )
    if color_map != "Spectral":
        import matplotlib

        cmap = matplotlib.colormaps[color_map]
        lut = (cmap(np.linspace(0, 1, _LUT_SIZE))[:, :3] * 255).round().astype(np.uint8)
    else:
        lut = _spectral_lut()
    x = np.clip(depth_maps.astype(np.float32), min_depth, max_depth)
    x = (x - min_depth) / (max_depth - min_depth)
    idx = np.clip((x[..., 0] * (_LUT_SIZE - 1)).round().astype(np.int32), 0, _LUT_SIZE - 1)
    return lut[idx]


def make_grid(
    imgs: np.ndarray | list[np.ndarray],
    nrow: int | None = None,
    resize: tuple[int, int] | None = None,
    interpolation: str = "bilinear",
) -> np.ndarray:
    """Compose [N,H,W,C] (or list of [H,W,C]) into one grid image.

    Default single row; ``resize=(h, w)`` with -1 preserving aspect — the
    reference's grid contract (utils.py:973-1066, default 2px padding).
    """
    if isinstance(imgs, list):
        if not imgs:
            raise ValueError("Empty list of images provided")
        for im in imgs:
            if im.ndim != 3:
                raise ValueError("Each image in the list must be [H,W,C]")
        imgs = np.stack(imgs)
    if imgs.ndim != 4:
        raise ValueError("Images must be 4D [N,H,W,C]")
    n, h, w, c = imgs.shape
    if imgs.dtype != np.uint8:
        imgs = (np.clip(imgs, 0, 1) * 255).round().astype(np.uint8)
    if nrow is None:
        nrow = n
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    pad = 2
    grid = np.zeros(
        (nrows * h + (nrows + 1) * pad, ncol * w + (ncol + 1) * pad, c), np.uint8
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y : y + h, x : x + w] = imgs[i]

    if resize is not None:
        th, tw = resize
        if th != -1 or tw != -1:
            gh, gw = grid.shape[:2]
            target_h = th if th != -1 else int(tw * gh / gw)
            target_w = tw if tw != -1 else int(th * gw / gh)
            import cv2

            interp = {
                "nearest": cv2.INTER_NEAREST,
                "bilinear": cv2.INTER_LINEAR,
                "bicubic": cv2.INTER_CUBIC,
                "lanczos": cv2.INTER_LANCZOS4,
            }.get(interpolation.lower())
            if interp is None:
                raise ValueError(f"Unsupported interpolation mode: {interpolation}")
            grid = cv2.resize(grid, (target_w, target_h), interpolation=interp)
            if grid.ndim == 2:
                grid = grid[..., np.newaxis]
    return grid


def has_nan(x) -> bool:
    """NaN guard for numpy/jax arrays (reference utils.py:1069-1081)."""
    return bool(np.isnan(np.asarray(x)).any())
