"""Generate a FULL-SIZE synthetic Marigold checkpoint in the HF layout.

Checkpoint-day readiness drill (VERDICT r3 #5): the real pinned weights
(`prs-eth/marigold-v1-0`, `madebyollin/taesd` — reference
marigold_dc.py:16-18, predict.py:478-488) cannot be downloaded in this
zero-egress environment, so this script writes a checkpoint with the REAL
layout, key inventory, and shapes — random values — so the *entire*
load → convert → shard → sample path can be exercised at production
geometry before weights ever arrive. After this drill the only untested
thing left is the weight values themselves.

Key-inventory provenance:
- text_encoder: the REAL ``transformers.CLIPTextModel`` state dict at SD2
  geometry (transformers is the reference's own dependency,
  requirements.txt:6) — fully independent of this repo's converters.
- unet / vae / taesd: exported by ``models/weights.py``'s
  ``to_diffusers_*_state`` (diffusers is not installed here); the export ↔
  convert round-trip is bit-exact-tested per family in
  tests/test_weights.py, and the tiny-config inventories match the
  diffusers naming rules those tests encode.

Layout written:
    OUT_DIR/
      unet/config.json + diffusion_pytorch_model.safetensors   (~866M params)
      vae/config.json + diffusion_pytorch_model.safetensors    (~84M)
      text_encoder/config.json + model.safetensors             (~340M)
      scheduler/scheduler_config.json                          (Marigold DDIM)
    TAESD_DIR/ (default OUT_DIR/../taesd)
      config.json + diffusion_pytorch_model.safetensors        (~2.4M)

Usage:
    python scripts/make_synthetic_checkpoint.py /tmp/drill/marigold-synth
    python scripts/verify_checkpoint.py /tmp/drill/marigold-synth \
        --taesd /tmp/drill/taesd
    # then the predict CLI:
    #   dct-predict SRC DST --model local --checkpoint-dir ... --taesd-dir ...

One-command drill: scripts/checkpoint_drill.sh
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# The diffusers config.json contents a real `prs-eth/marigold-v1-0` ships
# (SD2-class geometry; every field our registry.*_from_diffusers readers
# consume, plus the identifying _class_name).
UNET_CONFIG_JSON = {
    "_class_name": "UNet2DConditionModel",
    "in_channels": 8,
    "out_channels": 4,
    "block_out_channels": [320, 640, 1280, 1280],
    "down_block_types": [
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    ],
    "up_block_types": [
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    ],
    "layers_per_block": 2,
    "cross_attention_dim": 1024,
    "attention_head_dim": [5, 10, 20, 20],
    "norm_num_groups": 32,
    "norm_eps": 1e-05,
    "sample_size": 96,
}

VAE_CONFIG_JSON = {
    "_class_name": "AutoencoderKL",
    "in_channels": 3,
    "out_channels": 3,
    "latent_channels": 4,
    "block_out_channels": [128, 256, 512, 512],
    "layers_per_block": 2,
    "norm_num_groups": 32,
    "scaling_factor": 0.18215,
    "sample_size": 768,
}

# Marigold's DDIMScheduler config (v-prediction, scaled_linear betas —
# the schedule the sampler must read from the checkpoint, SURVEY.md §2.2).
SCHEDULER_CONFIG_JSON = {
    "_class_name": "DDIMScheduler",
    "num_train_timesteps": 1000,
    "beta_start": 0.00085,
    "beta_end": 0.012,
    "beta_schedule": "scaled_linear",
    "clip_sample": False,
    "set_alpha_to_one": False,
    "steps_offset": 1,
    "prediction_type": "v_prediction",
    "timestep_spacing": "leading",
}

TAESD_CONFIG_JSON = {
    "_class_name": "AutoencoderTiny",
    "in_channels": 3,
    "out_channels": 3,
    "latent_channels": 4,
    "encoder_block_out_channels": [64, 64, 64, 64],
    "decoder_block_out_channels": [64, 64, 64, 64],
    "num_encoder_blocks": [1, 3, 3, 3],
    "num_decoder_blocks": [3, 3, 3, 1],
    "scaling_factor": 1.0,
}


def _random_like_shapes(shapes: dict[str, tuple], dtype, seed: int) -> dict:
    """Random state dict with the given key→shape inventory (values are
    immaterial for the drill; small normals keep activations finite)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return {
        k: (rng.standard_normal(s) * 0.02).astype(dtype) for k, s in shapes.items()
    }


def _tree_shapes_to_state(export_fn, shape_tree, *args) -> dict[str, tuple]:
    """Key inventory + torch-side shapes via the exporter on a shape tree."""
    import numpy as np

    # exporters only look at .ndim/.shape and transpose; feed 0-byte stubs
    class _Stub:
        def __init__(self, shape):
            self.shape = tuple(shape)
            self.ndim = len(shape)

        def __array__(self, dtype=None):
            return np.zeros(self.shape, np.float16)

    import jax

    stub_tree = jax.tree.map(
        lambda l: _Stub(l.shape), shape_tree
    )
    state = export_fn(stub_tree, *args)
    return {k: tuple(v.shape) for k, v in state.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--taesd-out", type=Path, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = args.out_dir
    taesd_out = args.taesd_out or out.parent / "taesd"

    import jax
    import numpy as np
    from safetensors.numpy import save_file

    from depth_completion_tpu.core.platform import respect_jax_platforms_env

    respect_jax_platforms_env()

    from depth_completion_tpu.models import registry, vae_kl, vae_tiny, weights
    from depth_completion_tpu.models.unet import init_unet

    t0 = time.time()

    # ----- unet (shapes via eval_shape: no 866M-param init computed) -------
    unet_shapes = jax.eval_shape(
        lambda k: init_unet(k, registry.MARIGOLD_UNET_CONFIG),
        jax.random.PRNGKey(0),
    )
    shapes = _tree_shapes_to_state(weights.to_diffusers_unet_state, unet_shapes)
    state = _random_like_shapes(shapes, np.float16, args.seed)
    n_unet = sum(np.prod(s) for s in shapes.values())
    (out / "unet").mkdir(parents=True, exist_ok=True)
    (out / "unet" / "config.json").write_text(json.dumps(UNET_CONFIG_JSON, indent=2))
    save_file(state, str(out / "unet" / "diffusion_pytorch_model.safetensors"))
    print(f"unet: {len(shapes)} tensors, {n_unet/1e6:.1f}M params")
    del state

    # ----- vae --------------------------------------------------------------
    vae_shapes = jax.eval_shape(
        lambda k: vae_kl.init_vae(k, registry.SD_VAE_CONFIG), jax.random.PRNGKey(0)
    )
    shapes = _tree_shapes_to_state(weights.to_diffusers_vae_state, vae_shapes)
    state = _random_like_shapes(shapes, np.float16, args.seed + 1)
    n_vae = sum(np.prod(s) for s in shapes.values())
    (out / "vae").mkdir(parents=True, exist_ok=True)
    (out / "vae" / "config.json").write_text(json.dumps(VAE_CONFIG_JSON, indent=2))
    save_file(state, str(out / "vae" / "diffusion_pytorch_model.safetensors"))
    print(f"vae: {len(shapes)} tensors, {n_vae/1e6:.1f}M params")
    del state

    # ----- text encoder: REAL transformers CLIPTextModel --------------------
    import transformers

    cfg = registry.SD2_TEXT_CONFIG
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act=cfg.hidden_act,
        bos_token_id=cfg.bos_token_id,
        eos_token_id=cfg.eos_token_id,
    )
    model = transformers.CLIPTextModel(hf_cfg)
    te_state = {
        k: v.numpy().astype(np.float16)
        for k, v in model.state_dict().items()
        if not k.endswith("position_ids")
    }
    n_te = sum(v.size for v in te_state.values())
    (out / "text_encoder").mkdir(parents=True, exist_ok=True)
    (out / "text_encoder" / "config.json").write_text(hf_cfg.to_json_string())
    save_file(te_state, str(out / "text_encoder" / "model.safetensors"))
    print(f"text_encoder: {len(te_state)} tensors, {n_te/1e6:.1f}M params "
          "(inventory from transformers itself)")
    del te_state, model

    # ----- scheduler ---------------------------------------------------------
    (out / "scheduler").mkdir(parents=True, exist_ok=True)
    (out / "scheduler" / "scheduler_config.json").write_text(
        json.dumps(SCHEDULER_CONFIG_JSON, indent=2)
    )

    # ----- taesd --------------------------------------------------------------
    cfg_t = registry.TAESD_CONFIG
    taesd_shapes = jax.eval_shape(
        lambda k: vae_tiny.init_taesd(k, cfg_t), jax.random.PRNGKey(0)
    )
    shapes = _tree_shapes_to_state(
        weights.to_diffusers_taesd_state,
        taesd_shapes,
        cfg_t.encoder_blocks,
        cfg_t.decoder_blocks,
    )
    state = _random_like_shapes(shapes, np.float16, args.seed + 2)
    taesd_out.mkdir(parents=True, exist_ok=True)
    (taesd_out / "config.json").write_text(json.dumps(TAESD_CONFIG_JSON, indent=2))
    save_file(state, str(taesd_out / "diffusion_pytorch_model.safetensors"))
    print(f"taesd: {len(shapes)} tensors")

    print(f"Wrote {out} (+ {taesd_out}) in {time.time()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
