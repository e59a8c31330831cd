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

from depth_completion_tpu.models.layers import (
    conv2d,
    conv3x3_mean_tap,
    conv3x3_mean_tap_packed,
    conv_init,
)
from depth_completion_tpu.models.registry import TaesdConfig
from depth_completion_tpu.ops import conv3x3


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


# ---------------------------------------------------------------------------
# Width-packed decode path
#
# TAESD's 64 channels fill only half the TPU's 128-lane minor dimension, and
# measured decode convs run at ~45 TF/s vs ~136 TF/s for 128+-channel convs
# (PERF.md round 2). Packing adjacent width pairs into the channel dim
# ([N,H,W,64] → [N,H,W/2,128], a pure reshape) turns every 3×3 64→64 conv
# into an exactly-equivalent 3×3 128→128 conv whose kernel is built from the
# original taps: for packed output column j,
#     y_lo[j] = K0·x_hi[j-1] + K1·x_lo[j] + K2·x_hi[j]
#     y_hi[j] = K0·x_lo[j]   + K1·x_hi[j] + K2·x_lo[j+1]
# (K0/K1/K2 = kernel taps at dw=-1/0/+1). 1.5× the MACs (the corner blocks
# are zero) at ~3× the per-FLOP rate ⇒ ~2× net. Zero-padding the packed conv
# reproduces the original boundary behavior exactly (requires even W, true
# for all ×16-padded pipeline geometries; falls back to the plain path
# otherwise).
# ---------------------------------------------------------------------------


def _wpack(x):
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def _wunpack(xp):
    n, h, w2, c2 = xp.shape
    return xp.reshape(n, h, w2 * 2, c2 // 2)


def _wpack_kernel(k):
    """[3,3,c,c] HWIO → packed [3,3,2c,2c]."""
    z = jnp.zeros_like(k[:, 0])  # [3,c,c]

    def blk(lolo, hilo, lohi, hihi):
        top = jnp.concatenate([lolo, lohi], axis=-1)  # in-lo → (out-lo,out-hi)
        bot = jnp.concatenate([hilo, hihi], axis=-1)  # in-hi → (out-lo,out-hi)
        return jnp.concatenate([top, bot], axis=-2)  # [3,2c,2c]

    kp0 = blk(z, k[:, 0], z, z)  # input packed col j-1
    kp1 = blk(k[:, 1], k[:, 2], k[:, 0], k[:, 1])  # input packed col j
    kp2 = blk(z, z, k[:, 2], z)  # input packed col j+1
    return jnp.stack([kp0, kp1, kp2], axis=1)  # [3,3,2c,2c]


def _conv2d_wpacked(params, xp, relu=False, skip=None):
    kp = _wpack_kernel(params["kernel"]).astype(xp.dtype)
    b = params.get("bias")
    if conv3x3.enabled() and conv3x3.supported(xp):
        bp = None if b is None else jnp.concatenate([b, b])
        return conv3x3.conv3x3_fused(xp, kp, bp, relu=relu, skip=skip)
    y = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        bb = b.astype(xp.dtype)
        y = y + jnp.concatenate([bb, bb])
    if skip is not None:
        y = y + skip
    return jax.nn.relu(y) if relu else y


def _block_wpacked(p, xp):
    h = _conv2d_wpacked(p["conv1"], xp, relu=True)
    h = _conv2d_wpacked(p["conv2"], h, relu=True)
    return _conv2d_wpacked(p["conv3"], h, relu=True, skip=xp)


def _upsample_2x_wpacked(xp):
    """Packed nearest-2×: [N,H,W/2,2C] → [N,2H,W,2C] (both dims doubled).

    A stay-packed formulation (``concat([lo,lo,hi,hi])`` + minor-dim split,
    skipping the 64-channel intermediate) measured neutral at batch 8
    (0.5410 vs 0.5420 f/s; data formatting −0.7 ms/step but loop fusion
    +0.8 — PERF.md round-5 tried-and-rejected); the unpack form stays."""
    x = _wunpack(xp)  # [N,H,W,C]
    u = jnp.concatenate([x, x], axis=-1)  # packed row at doubled width
    return jnp.repeat(u, 2, axis=1)


def _decode_backbone_raw(params, latents: jnp.ndarray) -> tuple[jnp.ndarray, bool]:
    """Shared decoder trunk → (features, packed?): packed [N,H,W/2,2C] when
    the width-packed path ran (even W), else plain [N,H,W,C] — so heads that
    can consume the packed layout directly (conv3x3_mean_tap_packed) skip
    the full-tensor unpack relayout."""
    dec = params["decoder"]
    # soft clamp: 3·tanh(x/3)
    h = 3.0 * jnp.tanh(latents / 3.0)
    h = jax.nn.relu(conv2d(dec["conv_in"], h))

    if h.shape[2] % 2 == 0:
        hp = _wpack(h)
        for stage in dec["stages"]:
            for p in stage["blocks"]:
                hp = _block_wpacked(p, hp)
            if "up_conv" in stage:
                hp = _upsample_2x_wpacked(hp)
                hp = _conv2d_wpacked(stage["up_conv"], hp)
        return hp, True
    # odd width: plain path
    from depth_completion_tpu.models.layers import upsample_nearest_2x

    for stage in dec["stages"]:
        for p in stage["blocks"]:
            h = _block(p, h)
        if "up_conv" in stage:
            h = upsample_nearest_2x(h)
            h = conv2d(stage["up_conv"], h)
    return h, False


def _decode_backbone(params, latents: jnp.ndarray) -> jnp.ndarray:
    """Shared decoder trunk: latent → pre-``conv_out`` features [N,H,W,C]."""
    h, packed = _decode_backbone_raw(params, latents)
    return _wunpack(h) if packed else h


def decode(params, latents: jnp.ndarray, config: TaesdConfig) -> jnp.ndarray:
    """Latent → NHWC image in [-1,1]; cheap and differentiable."""
    del config
    h = _decode_backbone(params, latents)
    out01 = conv2d(params["decoder"]["conv_out"], h)
    return out01 * 2.0 - 1.0


def decode_depth(params, latents: jnp.ndarray, config: TaesdConfig) -> jnp.ndarray:
    """Latent → [0,1] single-channel depth — the Marigold decode head fused.

    Exactly ``clip(mean_rgb(decode(latents)), -1, 1)·0.5 + 0.5`` (the decode
    semantics the reference inherits, marigold_dc.py:373-430) with the
    channel mean folded into ``conv_out``:  mean_c(conv(h,W)+b) =
    conv(h, mean_c W) + mean_c b, so  depth = clip(conv(h, W̄) + b̄, 0, 1).
    Skips the [N,H,W,3] materialization and the mean's fwd+bwd on the
    per-step guidance gradient path.
    """
    del config
    h, packed = _decode_backbone_raw(params, latents)
    if packed:
        out = conv3x3_mean_tap_packed(params["decoder"]["conv_out"], h)
    else:
        out = conv3x3_mean_tap(params["decoder"]["conv_out"], h)
    return jnp.clip(out, 0.0, 1.0)[..., None]
