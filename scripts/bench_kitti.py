"""KITTI north-star config benchmark (BASELINE.md targets table).

Drives the REAL predict CLI at the KITTI-DC geometry — 1216×352 frames,
50-step guided DDIM, processing res 768, 5-member ensemble with the
BASELINE config's median/alignment reduce (KB_REDUCE overrides), bf16, TAESD — over a synthetic dataset (random weights; throughput
is weight-independent), and prints one JSON line with frames/s/chip,
per-frame wall time, compile time, and the device HBM high-water mark.

Run: PYTHONPATH=.:/root/.axon_site python scripts/bench_kitti.py
Env: KB_FRAMES (default 4), KB_ENSEMBLE (5), KB_STEPS (50).
"""

import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dct_xla_cache")

import numpy as np

BATCH = int(os.environ.get("KB_BATCH", "1"))
FRAMES = int(os.environ.get("KB_FRAMES", str(max(4, 3 * BATCH))))
ENSEMBLE = int(os.environ.get("KB_ENSEMBLE", "5"))
STEPS = int(os.environ.get("KB_STEPS", "50"))


def main():
    from depth_completion_tpu.io.image import save_img_array

    root = Path(tempfile.mkdtemp(prefix="dct_kitti_"))
    data, out = root / "data", root / "out"
    rng = np.random.default_rng(0)
    ds = data / "kitti"
    for i in range(FRAMES):
        img = rng.integers(1, 255, size=(352, 1216, 3)).astype(np.uint8)
        save_img_array(img, ds / "image" / f"{i:05d}.png")
        sparse = np.zeros((352, 1216, 3), np.uint8)
        mask = rng.random((352, 1216)) < 0.005  # ~2k lidar points
        sparse[mask, 0] = rng.integers(5, 200, mask.sum()).astype(np.uint8)
        save_img_array(sparse, ds / "sparse" / f"{i:05d}.png")

    args = [
        sys.executable, "-m", "depth_completion_tpu.cli.predict",
        str(data), str(out),
        "--model", "random", "--steps", str(STEPS), "--res", "768",
        "--ensemble", str(ENSEMBLE),
        "--ensemble-reduce", os.environ.get("KB_REDUCE", "aligned-median"),
        "--batch-size", str(BATCH),
        "--compress", "npy", "--vis", "false", "--log-level", "INFO",
    ]
    t0 = time.time()
    proc = subprocess.run(
        args, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=7200,
    )
    wall = time.time() - t0
    text = proc.stdout
    if proc.returncode != 0:
        print(text[-3000:])
        raise SystemExit(proc.returncode)

    # per-frame infer times from the tqdm postfix (steady state = last frame)
    infer = [float(m) for m in re.findall(r"time/infer=([0-9.]+)", text)]
    denses = sorted((out / "kitti" / "dense").glob("*.npy"))
    assert len(denses) == FRAMES, (len(denses), FRAMES)
    d = np.load(denses[-1])
    assert d.shape == (352, 1216, 1) and np.isfinite(d).all()

    # time/infer is per batch ITERATION (predict.py progress postfix), so
    # frames/s = BATCH / steady
    steady = min(infer[1:]) if len(infer) > 1 else infer[0]
    hbm = None
    for m in re.findall(r"HBM high-water: ([0-9.]+) GiB", text):
        hbm = float(m)
    result = {
        "metric": "kitti_frames_per_sec_per_chip",
        "value": round(BATCH / steady, 4),
        "unit": "frames/s",
        "config": f"1216x352, {STEPS}-step guided DDIM, res 768, "
        f"ensemble {ENSEMBLE} ({os.environ.get('KB_REDUCE', 'aligned-median')}), "
        f"batch {BATCH}, bf16, taesd",
        "s_per_frame": round(steady / BATCH, 2),
        "frames": FRAMES,
        "compile_plus_first_s": round(infer[0], 1) if infer else None,
        "process_wall_s": round(wall, 1),
        "hbm_high_water_gib": hbm,
        "git_commit": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
