"""Native dcz codec: round trips, compression effectiveness, corruption."""

import numpy as np
import pytest

from depth_completion_tpu.io import dcz
from depth_completion_tpu.io.codecs import load_array, save_array

pytestmark = pytest.mark.skipif(
    not dcz.available(), reason="native toolchain unavailable"
)


def test_roundtrip_float32(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 53)).astype(np.float32)
    p = tmp_path / "a.dcz"
    dcz.save_dcz(x, p)
    np.testing.assert_array_equal(dcz.load_dcz(p), x)


def test_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(1)
    for dtype in (np.float32, np.float64, np.uint8, np.int32, np.uint16):
        x = (rng.normal(size=(16, 24, 3)) * 100).astype(dtype)
        p = tmp_path / f"x_{np.dtype(dtype).name}.dcz"
        dcz.save_dcz(x, p)
        out = dcz.load_dcz(p)
        assert out.dtype == x.dtype
        np.testing.assert_array_equal(out, x)


def test_compresses_depth_like_data(tmp_path):
    """Sparse depth maps (mostly zeros + smooth values) must compress well."""
    rng = np.random.default_rng(2)
    depth = np.zeros((480, 640), np.float32)
    mask = rng.random((480, 640)) < 0.01
    depth[mask] = rng.uniform(1, 100, mask.sum()).astype(np.float32)
    p = tmp_path / "d.dcz"
    dcz.save_dcz(depth, p)
    ratio = depth.nbytes / p.stat().st_size
    assert ratio > 5.0, f"compression ratio only {ratio:.2f}"
    np.testing.assert_array_equal(dcz.load_dcz(p), depth)


def test_roundtrip_incompressible(tmp_path):
    x = np.frombuffer(np.random.default_rng(3).bytes(10001), np.uint8).copy()
    p = tmp_path / "r.dcz"
    dcz.save_dcz(x, p)
    np.testing.assert_array_equal(dcz.load_dcz(p), x)


def test_codecs_integration(tmp_path):
    x = np.linspace(0, 1, 1000, dtype=np.float32).reshape(10, 100)
    save_array(x, tmp_path / "a.dcz", compress="dcz")
    np.testing.assert_array_equal(load_array(tmp_path / "a.dcz"), x)
    with pytest.raises(ValueError):
        save_array(x, tmp_path / "a.npy", compress="dcz")


def test_corrupt_raises(tmp_path):
    x = np.ones((8, 8), np.float32)
    p = tmp_path / "c.dcz"
    dcz.save_dcz(x, p)
    data = bytearray(p.read_bytes())
    data[-3] ^= 0xFF
    p.write_bytes(bytes(data))
    with pytest.raises((ValueError, RuntimeError)):
        dcz.load_dcz(p)


def test_empty_and_scalar(tmp_path):
    x = np.float32(3.5).reshape(())
    p = tmp_path / "s.dcz"
    dcz.save_dcz(x, p)
    out = dcz.load_dcz(p)
    assert out.shape == () and out == np.float32(3.5)
