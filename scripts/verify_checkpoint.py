"""Verify a local Marigold HF-layout checkpoint loads and runs.

Usage:
    python scripts/verify_checkpoint.py /path/to/marigold-v1-0 \
        [--taesd /path/to/taesd] [--vae original|light]

Loads the bundle (configs from the checkpoint JSONs), prints parameter
counts per component, and runs one tiny guided step end-to-end. Run this
before pointing the predict CLI at new weights — converter mismatches fail
here with a key-level error instead of NaNs mid-sampling.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def count_params(tree) -> int:
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(tree))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_dir", type=Path)
    ap.add_argument("--taesd", type=Path, default=None)
    ap.add_argument("--vae", choices=["original", "light"], default="light")
    args = ap.parse_args()

    from depth_completion_tpu.core.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    import jax.numpy as jnp
    import numpy as np

    from depth_completion_tpu.models.bundle import load_bundle
    from depth_completion_tpu.pipeline import DepthCompletionPipeline

    vae_kind = "tiny" if args.vae == "light" else "kl"
    print(f"Loading {args.checkpoint_dir} (vae={vae_kind}) ...")
    bundle = load_bundle(
        args.checkpoint_dir, vae_kind=vae_kind, taesd_dir=args.taesd,
        dtype=jnp.bfloat16,
    )
    print(f"  unet:  {count_params(bundle.unet_params) / 1e6:,.1f} M params "
          f"({bundle.unet_config.block_out_channels})")
    print(f"  vae:   {count_params(bundle.vae.params) / 1e6:,.1f} M params "
          f"({bundle.vae.kind}, {bundle.vae.downsample_factor}x)")
    print(f"  text context: {tuple(bundle.text_context.shape)}")
    if bundle.ddim_config is not None:
        print(f"  scheduler: {bundle.ddim_config.prediction_type}, "
              f"{bundle.ddim_config.beta_schedule}")

    pipe = DepthCompletionPipeline(bundle)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(1, 128, 160, 3)).astype(np.float32)
    sparse = np.zeros((1, 128, 160, 1), np.float32)
    # varied values: a constant sparse frame has a degenerate minmax range
    # and is rejected by the pipeline (found by this very drill)
    sparse[0, ::16, ::16, 0] = rng.uniform(
        2.0, 100.0, sparse[0, ::16, ::16, 0].shape
    )
    denses, _ = pipe(images, sparse, max_depth=120.0, steps=2, resolution=128)
    d = np.asarray(denses)
    ok = np.isfinite(d).all()
    print(f"  smoke step: denses {d.shape}, finite={ok}, "
          f"range [{d.min():.2f}, {d.max():.2f}]")
    print("OK" if ok else "FAILED: non-finite output")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
