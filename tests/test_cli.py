"""CLI end-to-end: predict over a tiny dataset tree, then analyze results."""

import json

import numpy as np
import pytest

from depth_completion_tpu.io.image import save_img_array


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    ds = root / "scene"
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(1, 255, size=(48, 64, 3)).astype(np.uint8)
        save_img_array(img, ds / "image" / f"{i:05d}.png")
        sparse = np.zeros((48, 64, 3), np.uint8)
        mask = rng.random((48, 64)) < 0.05
        sparse[mask, 0] = rng.integers(10, 250, mask.sum()).astype(np.uint8)
        save_img_array(sparse, ds / "sparse" / f"{i:05d}.png")
    return root


def test_predict_and_analyze(dataset, tmp_path, monkeypatch):
    monkeypatch.setenv("DCT_RANDOM_MODEL_SIZE", "tiny")
    from depth_completion_tpu.cli.analyze import main as analyze_main
    from depth_completion_tpu.cli.predict import main as predict_main

    out = tmp_path / "out"
    args = [
        str(dataset), str(out),
        "--model", "random",
        "--steps", "2",
        "--res", "64",
        "--precision", "fp32",
        "--compress", "dcz",
        "--batch-size", "2",
        "--vis", "true",
    ]
    with pytest.raises(SystemExit) as e:
        predict_main(args, standalone_mode=True)
    assert e.value.code in (0, None)

    dense_dir = out / "scene" / "dense"
    denses = sorted(dense_dir.glob("*.dcz"))
    assert len(denses) == 3
    vis_dir = out / "scene" / "vis"
    assert len(list(vis_dir.glob("*_vis.jpg"))) == 3

    with pytest.raises(SystemExit) as e:
        analyze_main([str(dataset), str(out)], standalone_mode=True)
    assert e.value.code in (0, None)
    results = json.loads((out / "results_all.json").read_text())
    assert "overall" in results and "mae" in results["overall"]
    assert np.isfinite(results["overall"]["mae"])
    per_ds = json.loads((out / "scene" / "results.json").read_text())
    assert "binned" in per_ds and len(per_ds["binned"]) == 12  # 120m / 10m


def test_predict_compile_effort(dataset, tmp_path, monkeypatch):
    """--compile-effort routes through DepthCompletionPipeline's
    compiler_options (private jit wrappers) and still produces finite
    dense outputs."""
    monkeypatch.setenv("DCT_RANDOM_MODEL_SIZE", "tiny")
    from depth_completion_tpu.cli.predict import main as predict_main
    from depth_completion_tpu.io.codecs import load_array

    out = tmp_path / "out_effort"
    args = [
        str(dataset), str(out),
        "--model", "random",
        "--steps", "2",
        "--res", "64",
        "--precision", "fp32",
        "--compress", "npy",
        "--vis", "false",
        "--compile-effort", "-1.0",
    ]
    with pytest.raises(SystemExit) as e:
        predict_main(args, standalone_mode=True)
    assert e.value.code in (0, None)
    denses = sorted((out / "scene" / "dense").glob("*.npy"))
    assert len(denses) == 3
    for f in denses:
        a = load_array(f)
        assert np.isfinite(a).all()


def test_predict_temporal_mode(dataset, tmp_path, monkeypatch):
    monkeypatch.setenv("DCT_RANDOM_MODEL_SIZE", "tiny")
    from depth_completion_tpu.cli.predict import main as predict_main

    out = tmp_path / "out_temporal"
    args = [
        str(dataset), str(out),
        "--model", "random",
        "--steps", "2",
        "--res", "64",
        "--precision", "fp32",
        "--compress", "npy",
        "--use-prev-latent", "true",
        "--batch-size", "4",  # coerced to 1 with a warning
        "--vis", "false",
    ]
    with pytest.raises(SystemExit) as e:
        predict_main(args, standalone_mode=True)
    assert e.value.code in (0, None)
    assert len(list((out / "scene" / "dense").glob("*.npy"))) == 3


def test_predict_temporal_resume(dataset, tmp_path, monkeypatch):
    """Temporal jobs checkpoint latents on disk and resume from them."""
    monkeypatch.setenv("DCT_RANDOM_MODEL_SIZE", "tiny")
    from depth_completion_tpu.cli.predict import main as predict_main

    out = tmp_path / "out_resume"
    base = [
        str(dataset), str(out),
        "--model", "random", "--steps", "2", "--res", "64",
        "--precision", "fp32", "--compress", "npy",
        "--use-prev-latent", "true", "--vis", "false",
    ]
    with pytest.raises(SystemExit):
        predict_main(base, standalone_mode=True)
    assert (out / "scene" / "latent_state.npz").exists()
    n_before = len(list((out / "scene" / "dense").glob("*.npy")))
    assert n_before == 3

    # delete one output; resume should redo nothing (all frames done) but
    # must not crash and must keep the state file
    with pytest.raises(SystemExit):
        predict_main(base + ["--resume", "true"], standalone_mode=True)
    assert (out / "scene" / "latent_state.npz").exists()


def test_predict_ensemble(dataset, tmp_path, monkeypatch):
    monkeypatch.setenv("DCT_RANDOM_MODEL_SIZE", "tiny")
    from depth_completion_tpu.cli.predict import main as predict_main

    out = tmp_path / "out_ens"
    args = [
        str(dataset), str(out),
        "--model", "random", "--steps", "2", "--res", "64",
        "--precision", "fp32", "--compress", "npy",
        "--ensemble", "2", "--vis", "false",
    ]
    with pytest.raises(SystemExit) as e:
        predict_main(args, standalone_mode=True)
    assert e.value.code in (0, None)
    denses = sorted((out / "scene" / "dense").glob("*.npy"))
    assert len(denses) == 3
    d = np.load(denses[0])
    assert d.shape == (48, 64, 1) and np.isfinite(d).all()


def test_predict_vae_original(dataset, tmp_path, monkeypatch):
    """--vae original drives the KL decoder's fused depth head end-to-end
    (reference predict.py's default full-VAE path)."""
    monkeypatch.setenv("DCT_RANDOM_MODEL_SIZE", "tiny")
    from depth_completion_tpu.cli.predict import main as predict_main

    out = tmp_path / "out_kl"
    args = [
        str(dataset), str(out),
        "--model", "random", "--vae", "original",
        "--steps", "2", "--res", "64",
        "--precision", "fp32", "--compress", "npy", "--vis", "false",
    ]
    with pytest.raises(SystemExit) as e:
        predict_main(args, standalone_mode=True)
    assert e.value.code in (0, None)
    denses = sorted((out / "scene" / "dense").glob("*.npy"))
    assert len(denses) == 3
    for p in denses:
        d = np.load(p)
        assert d.shape == (48, 64, 1) and np.isfinite(d).all()


def test_predict_sharded_workers(dataset, tmp_path):
    """Two independent worker processes with --shard-index/--num-shards write
    disjoint, jointly complete outputs to a shared destination — the
    manifestless multi-host batch pattern (SURVEY.md §5 failure/resume)."""
    import os
    import re
    import subprocess
    import sys

    out = tmp_path / "out_sharded"
    env = dict(
        os.environ,
        DCT_RANDOM_MODEL_SIZE="tiny",
        JAX_PLATFORMS="cpu",
        # workers run sequentially: worker 1 reuses worker 0's compiled
        # program via the persistent cache instead of recompiling
        JAX_COMPILATION_CACHE_DIR=str(tmp_path / "xla_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    )
    outputs = []
    for idx in range(2):
        args = [
            sys.executable, "-m", "depth_completion_tpu.cli.predict",
            str(dataset), str(out),
            "--model", "random", "--steps", "1", "--res", "48",
            "--precision", "fp32", "--compress", "npy", "--vis", "false",
            "--shard-index", str(idx), "--num-shards", "2",
        ]
        proc = subprocess.run(
            args, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            timeout=600,
        )
        text = proc.stdout.decode()
        assert proc.returncode == 0, text
        outputs.append(text)

    # jointly complete: all 3 frames present exactly once
    denses = sorted((out / "scene" / "dense").glob("*.npy"))
    assert [p.name for p in denses] == ["00000.npy", "00001.npy", "00002.npy"]
    for p in denses:
        d = np.load(p)
        assert d.shape == (48, 64, 1) and np.isfinite(d).all()
    # disjoint: each worker logged its own frame count (2 + 1)
    counts = sorted(
        int(m.group(1).replace(",", ""))
        for text in outputs
        for m in [re.search(r"Shard \d+/2: ([\d,]+) frames", text)]
        if m
    )
    assert counts == [1, 2], counts


def test_predict_native_res(dataset, tmp_path, monkeypatch):
    """--native-res: sequence-sharded ring attention over the 8-device mesh
    produces outputs matching the plain path; --ensemble>1 is rejected."""
    monkeypatch.setenv("DCT_RANDOM_MODEL_SIZE", "tiny")
    from depth_completion_tpu.cli.predict import main as predict_main
    from depth_completion_tpu.io import load_array

    base, nres = tmp_path / "base", tmp_path / "nres"
    common = [
        str(dataset), "--model", "random", "--steps", "2", "--res", "64",
        "--precision", "fp32", "--compress", "npy", "--vis", "false",
    ]
    for out, extra in ((base, []), (nres, ["--native-res", "true"])):
        with pytest.raises(SystemExit) as e:
            predict_main(common[:1] + [str(out)] + common[1:] + extra,
                         standalone_mode=True)
        assert e.value.code in (0, None)
    a = load_array(base / "scene" / "dense" / "00000.npy")
    b = load_array(nres / "scene" / "dense" / "00000.npy")
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    with pytest.raises(SystemExit) as e:
        predict_main(
            common[:1] + [str(tmp_path / "bad")] + common[1:]
            + ["--native-res", "true", "--ensemble", "2"],
            standalone_mode=True,
        )
    assert e.value.code not in (0, None)  # UsageError


def test_predict_fast_guidance(dataset, tmp_path, monkeypatch):
    """--fast-guidance (detach UNet from the guidance gradient) runs e2e and
    produces finite depths that differ from the exact-gradient path."""
    monkeypatch.setenv("DCT_RANDOM_MODEL_SIZE", "tiny")
    from depth_completion_tpu.cli.predict import main as predict_main
    from depth_completion_tpu.io import load_array

    base, fast = tmp_path / "base", tmp_path / "fast"
    common = [
        str(dataset), "--model", "random", "--steps", "2", "--res", "64",
        "--precision", "fp32", "--compress", "npy", "--vis", "false",
    ]
    for out, extra in ((base, []), (fast, ["--fast-guidance", "true"])):
        with pytest.raises(SystemExit) as e:
            predict_main(common[:1] + [str(out)] + common[1:] + extra,
                         standalone_mode=True)
        assert e.value.code in (0, None)
    a = load_array(base / "scene" / "dense" / "00000.npy")
    b = load_array(fast / "scene" / "dense" / "00000.npy")
    assert np.isfinite(b).all()
    # the approximation changes the guidance gradient, so outputs differ
    assert float(np.max(np.abs(a - b))) > 0
