"""Resize/pad geometry: the preprocess contract (marigold_dc.py:687-693)."""

import numpy as np
import jax.numpy as jnp
import pytest

from depth_completion_tpu.ops.resize import (
    latent_size,
    pad_to_multiple,
    processing_size,
    resize_antialias,
    resize_to_max_edge,
    unpad,
)
from depth_completion_tpu.pipeline.preprocess import preprocess_images


def test_resize_to_max_edge_floor_semantics():
    x = jnp.zeros((1, 480, 640, 3))
    out = resize_to_max_edge(x, 768)
    # 768*480//640 = 576
    assert out.shape == (1, 576, 768, 3)
    x2 = jnp.zeros((1, 352, 1216, 3))
    out2 = resize_to_max_edge(x2, 768)
    # 768*352//1216 = 222 (floor)
    assert out2.shape == (1, 222, 768, 3)


def test_pad_unpad_roundtrip():
    x = jnp.arange(1 * 222 * 768 * 1, dtype=jnp.float32).reshape(1, 222, 768, 1)
    padded, padding = pad_to_multiple(x, 16)
    assert padded.shape == (1, 224, 768, 1)
    assert padding == (2, 0)
    # replicate padding: last row repeated
    np.testing.assert_array_equal(
        np.asarray(padded[0, 221]), np.asarray(padded[0, 223])
    )
    np.testing.assert_array_equal(np.asarray(unpad(padded, padding)), np.asarray(x))


def test_no_padding_needed():
    x = jnp.zeros((1, 576, 768, 3))
    padded, padding = pad_to_multiple(x)
    assert padding == (0, 0) and padded.shape == x.shape


def test_geometry_helpers():
    assert processing_size((480, 640), 768) == (576, 768)
    assert latent_size((480, 640), 768) == (72, 96)
    # KITTI: 352x1216 → resized 222x768 → padded 224x768 → latent 28x96
    assert processing_size((352, 1216), 768) == (224, 768)
    assert latent_size((352, 1216), 768) == (28, 96)
    # smaller downsample factors (test VAEs)
    assert latent_size((48, 64), 64, downsample=2) == (24, 32)


def test_preprocess_images_range_and_geometry():
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, size=(2, 480, 640, 3)).astype(np.float32)
    out, padding, orig_res = preprocess_images(jnp.asarray(imgs), 768)
    assert out.shape == (2, 576, 768, 3)
    assert padding == (0, 0)
    assert orig_res == (480, 640)
    o = np.asarray(out)
    assert o.min() >= -1.0 - 1e-5 and o.max() <= 1.0 + 1e-5
    assert o.std() > 0.3  # not collapsed


def test_resize_antialias_methods():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 1)), jnp.float32)
    for method in ("bilinear", "bicubic", "nearest"):
        out = resize_antialias(x, (16, 24), method=method)
        assert out.shape == (1, 16, 24, 1)
    with pytest.raises(ValueError):
        resize_antialias(x, (16, 16), method="bogus")


def test_resize_antialias_downsample_averages():
    """Antialiased 2x downsample of a checkerboard ≈ the mean value."""
    board = np.indices((1, 32, 32, 1)).sum(axis=0) % 2
    x = jnp.asarray(board, jnp.float32)
    out = np.asarray(resize_antialias(x, (16, 16)))
    np.testing.assert_allclose(out.mean(), 0.5, atol=0.05)
    assert out.std() < 0.2  # aliasing suppressed
