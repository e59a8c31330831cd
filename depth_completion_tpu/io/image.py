"""Host-side image IO: decode, colorspace, depth/segmask PNG codecs.

Capability match for reference utils.py:533-589,817-970,1084-1158 in numpy
NHWC layout:

- ``load_img_array``: OpenCV imread (IMREAD_UNCHANGED), BGR→RGB / gray "L"
  conversion, all-zero images → None (the reference's load-failure contract).
- ``image_size``: pure-python header sniffing (PNG/JPEG/GIF/BMP) replacing
  the ``imagesize`` dependency (reference utils.py:1171).
- ``to_depth``: 8-bit intensity channel 0 → metric depth
  ``max_distance·v/255`` (reference utils.py:1137-1158).
- ``to_segmask``: RGB color table → class-id mask (reference utils.py:1084-1134).
"""

from __future__ import annotations

import concurrent.futures
import struct
from pathlib import Path

import cv2
import numpy as np


def image_size(path: Path) -> tuple[int, int]:
    """(width, height) from file headers; (-1, -1) if not a known image."""
    try:
        with open(path, "rb") as f:
            head = f.read(32)
            if len(head) < 10:
                return (-1, -1)
            # PNG
            if head.startswith(b"\x89PNG\r\n\x1a\n"):
                w, h = struct.unpack(">II", head[16:24])
                return (w, h)
            # GIF
            if head[:6] in (b"GIF87a", b"GIF89a"):
                w, h = struct.unpack("<HH", head[6:10])
                return (w, h)
            # BMP
            if head.startswith(b"BM"):
                w, h = struct.unpack("<ii", head[18:26])
                return (w, abs(h))
            # JPEG: walk the segment markers to a SOF
            if head.startswith(b"\xff\xd8"):
                f.seek(2)
                while True:
                    seg = f.read(4)
                    if len(seg) < 4:
                        return (-1, -1)
                    marker, size = seg[0:2], struct.unpack(">H", seg[2:4])[0]
                    if marker[0] != 0xFF:
                        return (-1, -1)
                    if 0xC0 <= marker[1] <= 0xCF and marker[1] not in (
                        0xC4,
                        0xC8,
                        0xCC,
                    ):
                        body = f.read(5)
                        h, w = struct.unpack(">HH", body[1:5])
                        return (w, h)
                    f.seek(size - 2, 1)
    except OSError:
        pass
    return (-1, -1)


def is_img_file(path: Path) -> bool:
    return path.is_file() and image_size(path) != (-1, -1)


def load_img_array(path: Path, mode: str | None = None) -> np.ndarray | None:
    """Decode an image to [H,W,C] numpy; None on failure or all-zero image."""
    if not is_img_file(Path(path)):
        return None
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        return None
    if mode is None:
        if img.ndim == 3 and img.shape[2] == 3:
            mode = "RGB"
        elif img.ndim == 2 or (img.ndim == 3 and img.shape[2] == 1):
            mode = "L"
    if mode == "RGB":
        if img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
        elif img.shape[2] == 4:
            img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGB)
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    elif mode == "L":
        if img.ndim == 3 and img.shape[2] >= 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        if img.ndim == 2:
            img = img[..., np.newaxis]
    if not np.any(img):
        return None
    return img


def load_img_arrays(
    paths: list[Path], mode: str | None = None, num_threads: int = 1
) -> list[np.ndarray | None]:
    """Order-preserving threaded batch decode (reference utils.py:921-970)."""
    if not paths:
        return []
    if num_threads == 1:
        return [load_img_array(p, mode) for p in paths]
    with concurrent.futures.ThreadPoolExecutor(max_workers=num_threads) as ex:
        return list(ex.map(lambda p: load_img_array(p, mode), paths))


def save_img_array(img: np.ndarray, path: Path) -> None:
    """Save [H,W,C] RGB (uint8 or float in [0,1]) — reference utils.py:533-589."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if img.dtype != np.uint8:
        if img.max() > 1.0 + 1e-6 or img.min() < -1e-6:
            raise ValueError("float image must be in [0, 1]")
        img = (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    elif img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    if not cv2.imwrite(str(path), img):
        raise IOError(f"Failed to write image to {path}")


def to_depth(
    imgs: np.ndarray, dtype=np.float32, max_distance: float = 120.0
) -> np.ndarray:
    """[N,H,W,3] uint8-range → [N,H,W,1] metric depth from channel 0."""
    return (max_distance * (imgs.astype(dtype)[..., 0] / 255.0))[..., np.newaxis]


def to_segmask(
    imgs: np.ndarray, colormap: list[tuple[int, int, int]]
) -> np.ndarray:
    """[N,H,W,3] RGB class colors → [N,H,W,1] class-id mask."""
    if imgs.ndim != 4 or imgs.shape[-1] != 3:
        raise ValueError("Input must be [N, H, W, 3]")
    seg = np.zeros(imgs.shape[:3] + (1,), dtype=imgs.dtype)
    for class_id, rgb in enumerate(colormap):
        match = np.all(imgs == np.asarray(rgb, dtype=imgs.dtype), axis=-1)
        seg[match] = class_id
    return seg
