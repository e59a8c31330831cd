"""Export golden fixtures from the torch reference for parity testing.

RUN THIS ON A CUDA HOST with the reference's environment (torch 2.5.1,
diffusers 0.31.0, HF hub access) and the reference repo on sys.path:

    python scripts/export_reference_fixtures.py /path/to/reference_repo \
        fixtures/ [--steps 4] [--res 256]

It runs the reference ``MarigoldDepthCompletionPipeline`` on a deterministic
synthetic frame and dumps:

    fixtures/
      input_image.npy        [H, W, 3]  uint8-range float32
      input_sparse.npy       [H, W, 1]  metric depth, 0 = missing
      config.json            run configuration + seeds
      dense_<mode>.npy       metric dense depth per mode

Modes: per_step (train_latents, learned affine), closed_form
(train_latents=False), per_input.

The companion test (tests/test_reference_fixtures.py) loads these with the
real checkpoints and bounds our MAE/RMSE drift against each fixture — the
BASELINE.md "accuracy within bound" criterion. This script only *drives* the
reference as a black box; no reference code is vendored here.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def synth_inputs(h=480, w=640, seed=0):
    rng = np.random.default_rng(seed)
    image = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
    sparse = np.zeros((h, w, 1), np.float32)
    mask = rng.random((h, w, 1)) < 0.002
    sparse[mask] = rng.uniform(2.0, 80.0, mask.sum()).astype(np.float32)
    return image, sparse


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("reference_repo", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--seed", type=int, default=2024)
    args = ap.parse_args()

    sys.path.insert(0, str(args.reference_repo))
    import torch
    from marigold_dc import MarigoldDepthCompletionPipeline  # reference module

    if not torch.cuda.is_available():
        print("CUDA required (the reference is CUDA-only)", file=sys.stderr)
        return 1

    image, sparse = synth_inputs()
    args.out_dir.mkdir(parents=True, exist_ok=True)
    np.save(args.out_dir / "input_image.npy", image)
    np.save(args.out_dir / "input_sparse.npy", sparse)

    pipe = MarigoldDepthCompletionPipeline.from_pretrained(
        "prs-eth/marigold-v1-0", prediction_type="depth",
        torch_dtype=torch.float32,
    ).to("cuda")

    imgs_t = torch.from_numpy(image).permute(2, 0, 1)[None].cuda()
    sparse_t = torch.from_numpy(sparse).permute(2, 0, 1)[None].cuda()

    common = dict(
        max_depth=120.0, steps=args.steps, resolution=args.res,
        seed=args.seed, norm="const",
    )
    modes = {
        "per_step": dict(train_latents=True, train_method="per-step"),
        "closed_form": dict(train_latents=False),
        "per_input": dict(train_latents=True, train_method="per-input",
                          train_steps=4),
    }
    for name, extra in modes.items():
        denses, _ = pipe(imgs_t, sparse_t, **common, **extra)
        np.save(
            args.out_dir / f"dense_{name}.npy",
            denses[0].float().cpu().numpy().transpose(1, 2, 0),
        )
        print(f"exported dense_{name}.npy")

    (args.out_dir / "config.json").write_text(
        json.dumps({**common, "modes": list(modes)}, indent=2)
    )
    print(f"fixtures in {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
