"""Host IO layer: codecs, image decode, dataset discovery, csv, viz."""

import numpy as np
import pytest

from depth_completion_tpu.io import (
    NPARRAY_EXTS,
    find_dataset_dirs,
    find_file_with_exts,
    image_size,
    is_dataset_dir,
    load_array,
    load_img_array,
    save_array,
    save_img_array,
    to_depth,
    to_segmask,
)
from depth_completion_tpu.io.csvio import load_csv, load_segmap
from depth_completion_tpu.viz import has_nan, make_grid, visualize_depth


def test_array_roundtrip_npy_npz(tmp_path):
    x = np.random.default_rng(0).normal(size=(4, 5)).astype(np.float32)
    save_array(x, tmp_path / "a.npy")
    np.testing.assert_array_equal(load_array(tmp_path / "a.npy"), x)
    save_array(x, tmp_path / "a.npz", compress="npz")
    np.testing.assert_array_equal(load_array(tmp_path / "a.npz"), x)


def test_array_roundtrip_bl2(tmp_path):
    # served by python-blosc2 when installed, by io/bl2.py otherwise
    x = np.random.default_rng(0).normal(size=(4, 5)).astype(np.float32)
    save_array(x, tmp_path / "a.bl2", compress="bl2")
    np.testing.assert_array_equal(load_array(tmp_path / "a.bl2"), x)


def test_save_array_extension_mismatch(tmp_path):
    x = np.zeros((2, 2))
    with pytest.raises(ValueError):
        save_array(x, tmp_path / "a.npz")  # None → .npy required
    with pytest.raises(ValueError):
        save_array(x, tmp_path / "a.npy", compress="npz")


def test_save_array_bf16_upcast(tmp_path):
    import jax.numpy as jnp

    x = np.asarray(jnp.ones((2, 2), jnp.bfloat16))
    save_array(x, tmp_path / "a.npy")
    assert load_array(tmp_path / "a.npy").dtype == np.float32


def test_image_roundtrip_and_size(tmp_path):
    img = np.random.default_rng(0).integers(1, 255, size=(20, 30, 3)).astype(np.uint8)
    save_img_array(img, tmp_path / "x.png")
    assert image_size(tmp_path / "x.png") == (30, 20)
    loaded = load_img_array(tmp_path / "x.png", mode="RGB")
    np.testing.assert_array_equal(loaded, img)
    # jpeg size sniffing
    save_img_array(img, tmp_path / "x.jpg")
    assert image_size(tmp_path / "x.jpg") == (30, 20)


def test_all_zero_image_is_none(tmp_path):
    img = np.zeros((8, 8, 3), np.uint8)
    save_img_array(img, tmp_path / "z.png")
    assert load_img_array(tmp_path / "z.png") is None


def test_to_depth():
    imgs = np.zeros((1, 2, 2, 3), np.uint8)
    imgs[0, 0, 0, 0] = 255
    imgs[0, 1, 1, 0] = 51
    d = to_depth(imgs, max_distance=120.0)
    assert d.shape == (1, 2, 2, 1)
    assert np.isclose(d[0, 0, 0, 0], 120.0)
    assert np.isclose(d[0, 1, 1, 0], 120.0 * 51 / 255)


def test_to_segmask():
    cmap = [(0, 0, 0), (255, 0, 0), (0, 255, 0)]
    img = np.zeros((1, 2, 2, 3), np.uint8)
    img[0, 0, 0] = (255, 0, 0)
    img[0, 1, 1] = (0, 255, 0)
    seg = to_segmask(img, cmap)
    assert seg[0, 0, 0, 0] == 1
    assert seg[0, 1, 1, 0] == 2
    assert seg[0, 0, 1, 0] == 0


def test_dataset_discovery(tmp_path):
    ds = tmp_path / "scene1"
    (ds / "image").mkdir(parents=True)
    (ds / "sparse").mkdir()
    assert is_dataset_dir(ds)
    assert find_dataset_dirs(tmp_path) == [ds]
    assert find_dataset_dirs(ds) == [ds]
    # nested discovery
    ds2 = tmp_path / "group" / "scene2"
    (ds2 / "image").mkdir(parents=True)
    (ds2 / "sparse").mkdir()
    found = find_dataset_dirs(tmp_path)
    assert set(found) == {ds, ds2}


def test_find_file_with_exts(tmp_path):
    (tmp_path / "d.npz").write_bytes(b"x")
    assert find_file_with_exts(tmp_path / "d.npy", NPARRAY_EXTS) == tmp_path / "d.npz"
    assert find_file_with_exts(tmp_path / "missing.npy", [".foo"]) is None


def test_load_csv_and_segmap(tmp_path):
    p = tmp_path / "map.csv"
    p.write_text("id,name,r,g,b\n0,road,128,64,128\n1,car,0,0,142\n")
    rows = load_csv(p, {"id": int, "name": str})
    assert rows == [{"id": 0, "name": "road"}, {"id": 1, "name": "car"}]
    seg = load_segmap(p)
    assert seg["name"] == ["road", "car"]
    assert seg["color"][1] == (0, 0, 142)
    with pytest.raises(ValueError):
        load_csv(p, {"missing_col": int})


def test_visualize_depth_and_grid():
    d = np.linspace(0, 100, 16, dtype=np.float32).reshape(1, 4, 4, 1)
    vis = visualize_depth(d, max_depth=100.0)
    assert vis.shape == (1, 4, 4, 3) and vis.dtype == np.uint8
    # Spectral: low depth → red-ish, high → blue-ish
    assert vis[0, 0, 0, 0] > vis[0, 0, 0, 2]
    assert vis[0, 3, 3, 2] > vis[0, 3, 3, 0]
    with pytest.raises(ValueError):
        visualize_depth(d, max_depth=0.0, min_depth=1.0)
    grid = make_grid([vis[0], vis[0], vis[0]])
    assert grid.ndim == 3 and grid.shape[2] == 3
    grid2 = make_grid(vis, resize=(8, -1))
    assert grid2.shape[0] == 8


def test_has_nan():
    assert has_nan(np.asarray([1.0, np.nan]))
    assert not has_nan(np.asarray([1.0, 2.0]))
