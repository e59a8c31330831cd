"""Accuracy parity vs exported reference fixtures (round-2 infrastructure).

Runs only when both are present (neither exists in the zero-egress CI box):

    DCT_FIXTURES_DIR      fixtures from scripts/export_reference_fixtures.py
    DCT_CHECKPOINT_DIR    local HF-layout marigold checkpoint
    DCT_TAESD_DIR         optional TAESD dir (else KL VAE)

Bounds the masked MAE between our dense output and the reference's on the
same synthetic frame — the BASELINE.md "accuracy within bound" criterion.
Deterministic PRNG differences (jax vs torch generator draws) mean the
diffusion trajectories differ; the bound is therefore on anchor-consistency
and output agreement, not bit equality.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

FIXTURES = os.environ.get("DCT_FIXTURES_DIR")
CHECKPOINT = os.environ.get("DCT_CHECKPOINT_DIR")

pytestmark = pytest.mark.skipif(
    not (FIXTURES and Path(FIXTURES).is_dir() and CHECKPOINT),
    reason="reference fixtures / checkpoints not available",
)


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    from depth_completion_tpu.models.bundle import load_bundle
    from depth_completion_tpu.pipeline import DepthCompletionPipeline

    fixtures = Path(FIXTURES)
    cfg = json.loads((fixtures / "config.json").read_text())
    taesd = os.environ.get("DCT_TAESD_DIR")
    bundle = load_bundle(
        Path(CHECKPOINT),
        vae_kind="tiny" if taesd else "kl",
        taesd_dir=Path(taesd) if taesd else None,
        dtype=jnp.float32,
    )
    pipe = DepthCompletionPipeline(bundle)
    image = np.load(fixtures / "input_image.npy")[None]
    sparse = np.load(fixtures / "input_sparse.npy")[None]
    return pipe, fixtures, cfg, image, sparse


MODE_ARGS = {
    "per_step": dict(train_latents=True, train_method="per-step"),
    "closed_form": dict(train_latents=False),
    "per_input": dict(train_latents=True, train_method="per-input", train_steps=4),
}


@pytest.mark.parametrize("mode", ["per_step", "closed_form", "per_input"])
def test_dense_output_parity(setup, mode):
    pipe, fixtures, cfg, image, sparse = setup
    ref = np.load(fixtures / f"dense_{mode}.npy")
    ours, _ = pipe(
        image,
        sparse,
        max_depth=cfg["max_depth"],
        steps=cfg["steps"],
        resolution=cfg["resolution"],
        seed=cfg["seed"],
        norm=cfg["norm"],
        **MODE_ARGS[mode],
    )
    ours = np.asarray(ours)[0]
    mask = sparse[0] > 0
    # anchors: both implementations must track the sparse points comparably
    mae_ours = np.abs(ours[mask] - sparse[0][mask]).mean()
    mae_ref = np.abs(ref[mask] - sparse[0][mask]).mean()
    assert mae_ours <= mae_ref * 1.5 + 0.5, (mae_ours, mae_ref)
    # outputs: bounded disagreement over the full frame
    assert np.abs(ours - ref).mean() < 0.15 * cfg["max_depth"]
