"""Analyzer engine: self-consistency and true-GT paths, binning semantics."""

import json

import numpy as np
import pytest

from depth_completion_tpu.eval.analyzer import analyze_datasets
from depth_completion_tpu.eval.metrics import calc_bins
from depth_completion_tpu.io.codecs import save_array
from depth_completion_tpu.io.image import save_img_array


def _make_dataset(root, n_frames=2, h=16, w=20, seed=0):
    rng = np.random.default_rng(seed)
    ds = root / "scene"
    sparses = []
    for i in range(n_frames):
        sparse_png = np.zeros((h, w, 3), np.uint8)
        mask = rng.random((h, w)) < 0.3
        sparse_png[mask, 0] = rng.integers(10, 250, mask.sum()).astype(np.uint8)
        save_img_array(sparse_png, ds / "sparse" / f"{i:03d}.png")
        save_img_array(
            rng.integers(1, 255, size=(h, w, 3)).astype(np.uint8),
            ds / "image" / f"{i:03d}.png",
        )
        sparses.append(120.0 * sparse_png[..., 0].astype(np.float32) / 255.0)
    return ds, sparses


def test_self_consistency_perfect_prediction(tmp_path):
    """Dense == sparse everywhere → MAE = RMSE = 0."""
    data = tmp_path / "data"
    out = tmp_path / "out"
    ds, sparses = _make_dataset(data)
    for i, s in enumerate(sparses):
        save_array(s[..., np.newaxis], out / "scene" / "dense" / f"{i:03d}.npy")
    results = analyze_datasets(data, out)
    assert results["overall"]["mae"] == pytest.approx(0.0, abs=1e-5)
    assert results["overall"]["rmse"] == pytest.approx(0.0, abs=1e-5)
    assert (out / "scene" / "results.json").exists()
    assert (out / "results_all.json").exists()


def test_constant_offset_error(tmp_path):
    """Dense = sparse + 2 at every point → MAE = RMSE = 2."""
    data = tmp_path / "data"
    out = tmp_path / "out"
    ds, sparses = _make_dataset(data)
    for i, s in enumerate(sparses):
        save_array((s + 2.0)[..., np.newaxis], out / "scene" / "dense" / f"{i:03d}.npy")
    results = analyze_datasets(data, out, max_depth=200.0)
    assert results["overall"]["mae"] == pytest.approx(2.0, rel=1e-4)
    assert results["overall"]["rmse"] == pytest.approx(2.0, rel=1e-4)


def test_gt_png16_evaluation(tmp_path):
    """KITTI-style 16-bit GT: dense == gt → zero error even though sparse differs."""
    import cv2

    data = tmp_path / "data"
    out = tmp_path / "out"
    ds, sparses = _make_dataset(data)
    rng = np.random.default_rng(7)
    for i, s in enumerate(sparses):
        gt = rng.uniform(1, 80, size=s.shape).astype(np.float32)
        gt[rng.random(s.shape) < 0.5] = 0.0  # invalid pixels
        path = ds / "groundtruth" / f"{i:03d}.png"
        path.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(path), (gt * 256.0).astype(np.uint16))
        gt_quantized = (gt * 256.0).astype(np.uint16).astype(np.float32) / 256.0
        save_array(
            gt_quantized[..., np.newaxis], out / "scene" / "dense" / f"{i:03d}.npy"
        )
    results = analyze_datasets(data, out, gt_dir="groundtruth", gt_format="png16")
    assert results["overall"]["mae"] == pytest.approx(0.0, abs=1e-3)


def test_missing_dense_warns_and_skips(tmp_path):
    data = tmp_path / "data"
    out = tmp_path / "out"
    ds, sparses = _make_dataset(data, n_frames=3)
    # only 2 of 3 frames have results
    for i in (0, 2):
        save_array(
            sparses[i][..., np.newaxis], out / "scene" / "dense" / f"{i:03d}.npy"
        )
    results = analyze_datasets(data, out)
    assert np.isfinite(results["overall"]["mae"])


def test_calc_bins():
    bins = calc_bins(0.0, 25.0, 10.0)
    assert bins == [(0.0, 10.0), (10.0, 20.0), (20.0, 25.0)]
    with pytest.raises(ValueError):
        calc_bins(5.0, 5.0, 1.0)


def test_binned_results_structure(tmp_path):
    data = tmp_path / "data"
    out = tmp_path / "out"
    ds, sparses = _make_dataset(data)
    for i, s in enumerate(sparses):
        save_array(s[..., np.newaxis], out / "scene" / "dense" / f"{i:03d}.npy")
    analyze_datasets(data, out, bin_size=30.0)
    per_ds = json.loads((out / "scene" / "results.json").read_text())
    assert len(per_ds["binned"]) == 4  # 120 / 30
    pct = sum(b["percentage"] for b in per_ds["binned"])
    assert pct == pytest.approx(100.0, abs=1.0)


def test_accel_matches_host_path(tmp_path):
    """Device-jitted metrics must agree with the host numpy path."""
    data = tmp_path / "data"
    out_a = tmp_path / "out_a"
    out_b = tmp_path / "out_b"
    ds, sparses = _make_dataset(data, n_frames=2)
    for out in (out_a, out_b):  # identical noisy predictions in both trees
        for i, s in enumerate(sparses):
            noise = np.random.default_rng(100 + i).standard_normal(s.shape)
            noisy = s + noise.astype(np.float32)
            save_array(noisy[..., np.newaxis], out / "scene" / "dense" / f"{i:03d}.npy")
    host = analyze_datasets(data, out_a, accel=False)
    accel = analyze_datasets(data, out_b, accel=True)
    assert host["overall"]["mae"] == pytest.approx(accel["overall"]["mae"], rel=1e-4)
    assert host["overall"]["rmse"] == pytest.approx(accel["overall"]["rmse"], rel=1e-4)
    for hb, ab in zip(host["binned"], accel["binned"]):
        assert hb["percentage"] == pytest.approx(ab["percentage"], abs=0.1)
