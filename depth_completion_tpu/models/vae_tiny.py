"""Tiny VAE (TAESD) — the default fast decode path.

The reference swaps the SD VAE for ``madebyollin/taesd`` by default
(``--vae=light``, reference predict.py:44-52,484-488); its decoder is what
the guidance gradient flows through in production. Plain conv/ReLU topology:

- encoder: conv 3→C, then stages of residual Blocks with strided-conv
  downsamples between, conv C→4. Input mapped [-1,1]→[0,1] first.
- decoder: soft-clamp (3·tanh(x/3)), conv 4→C, ReLU, stages of Blocks with
  nearest-2× upsample + bias-free conv between, conv C→3, output mapped
  [0,1]→[-1,1].
- Block(C) = (conv→relu→conv→relu→conv) + skip, then ReLU.

TAESD consumes/produces SD-scaled latents directly (scaling_factor 1.0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depth_completion_tpu.models.layers import conv2d, conv_init
from depth_completion_tpu.models.registry import TaesdConfig


def _block_init(key, c, dtype):
    ks = jax.random.split(key, 3)
    return {
        "conv1": conv_init(ks[0], 3, 3, c, c, dtype),
        "conv2": conv_init(ks[1], 3, 3, c, c, dtype),
        "conv3": conv_init(ks[2], 3, 3, c, c, dtype),
    }


def _block(p, x):
    h = jax.nn.relu(conv2d(p["conv1"], x))
    h = jax.nn.relu(conv2d(p["conv2"], h))
    h = conv2d(p["conv3"], h)
    return jax.nn.relu(h + x)


def init_taesd(key, config: TaesdConfig, dtype=jnp.float32):
    cfg = config
    c = cfg.channels
    keys = iter(jax.random.split(key, 128))

    enc: dict = {"conv_in": conv_init(next(keys), 3, 3, 3, c, dtype), "stages": []}
    for i, n_blocks in enumerate(cfg.encoder_blocks):
        stage = {"blocks": [_block_init(next(keys), c, dtype) for _ in range(n_blocks)]}
        if i > 0:
            stage["down"] = conv_init(next(keys), 3, 3, c, c, dtype, use_bias=False)
        enc["stages"].append(stage)
    enc["conv_out"] = conv_init(next(keys), 3, 3, c, cfg.latent_channels, dtype)

    dec: dict = {
        "conv_in": conv_init(next(keys), 3, 3, cfg.latent_channels, c, dtype),
        "stages": [],
    }
    for i, n_blocks in enumerate(cfg.decoder_blocks):
        stage = {"blocks": [_block_init(next(keys), c, dtype) for _ in range(n_blocks)]}
        if i < len(cfg.decoder_blocks) - 1:
            stage["up_conv"] = conv_init(next(keys), 3, 3, c, c, dtype, use_bias=False)
        dec["stages"].append(stage)
    dec["conv_out"] = conv_init(next(keys), 3, 3, c, 3, dtype)
    return {"encoder": enc, "decoder": dec}


def encode(params, images: jnp.ndarray, config: TaesdConfig) -> jnp.ndarray:
    """[-1,1] NHWC → latent [N, H/8, W/8, 4] (already in diffusion scale)."""
    del config
    enc = params["encoder"]
    h = (images + 1.0) / 2.0
    h = conv2d(enc["conv_in"], h)
    for i, stage in enumerate(enc["stages"]):
        if "down" in stage:
            h = conv2d(stage["down"], h, stride=2, padding=1)
        for p in stage["blocks"]:
            h = _block(p, h)
    return conv2d(enc["conv_out"], h)


def decode(params, latents: jnp.ndarray, config: TaesdConfig) -> jnp.ndarray:
    """Latent → NHWC image in [-1,1]; cheap and differentiable."""
    del config
    dec = params["decoder"]
    # soft clamp: 3·tanh(x/3)
    h = 3.0 * jnp.tanh(latents / 3.0)
    h = jax.nn.relu(conv2d(dec["conv_in"], h))
    from depth_completion_tpu.models.layers import upsample_nearest_2x

    for stage in dec["stages"]:
        for p in stage["blocks"]:
            h = _block(p, h)
        if "up_conv" in stage:
            h = upsample_nearest_2x(h)
            h = conv2d(stage["up_conv"], h)
    out01 = conv2d(dec["conv_out"], h)
    return out01 * 2.0 - 1.0
