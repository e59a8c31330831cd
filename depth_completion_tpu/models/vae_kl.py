"""KL autoencoder (SD VAE): 8× spatial downsample, 4 latent channels.

Capability match for diffusers ``AutoencoderKL`` as the reference uses it
(marigold_dc.py:7; predict.py:478): deterministic encode (posterior mean ·
scaling_factor 0.18215) and a decoder that sits on the guidance gradient path
(reference marigold_dc.py:828-840) and must therefore be differentiable —
which every op here is.

Structure: encoder conv_in → 4 down stages (resnets ×L, strided-conv
downsample between) → mid (resnet, single-head spatial attention, resnet) →
GN/silu/conv_out → 2·C_lat moments → quant_conv. Decoder mirrors with 3
upsamples and post_quant_conv. ResNet blocks are time-embedding-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depth_completion_tpu.models.layers import (
    conv2d,
    conv3x3_mean_tap,
    conv_init,
    group_norm,
    linear,
    linear_init,
    norm_init,
    silu,
    upsample_conv_2x_matmul,
)
from depth_completion_tpu.models.registry import VAEConfig
from depth_completion_tpu.ops import conv3x3
from depth_completion_tpu.ops.flash_attention import flash_attention


def _resnet_init(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": norm_init(cin, dtype),
        "conv1": conv_init(ks[0], 3, 3, cin, cout, dtype),
        "norm2": norm_init(cout, dtype),
        "conv2": conv_init(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = conv_init(ks[2], 1, 1, cin, cout, dtype)
    return p


def _conv3(p, x):
    """Stride-1 SAME 3×3 conv; fused Pallas kernel where the layout allows.

    The KL decoder sits on the per-step guidance gradient path
    (marigold_dc.py:828-840) under ``--vae full`` — same HBM-traffic
    rationale as the packed TAESD stages (ops/conv3x3.py docstring).
    """
    if conv3x3.enabled() and conv3x3.supported(x):
        return conv3x3.conv3x3_fused(x, p["kernel"], p.get("bias"))
    return conv2d(p, x)


def _resnet(p, x, cfg: VAEConfig):
    h = group_norm(p["norm1"], x, cfg.norm_groups, cfg.norm_eps)
    h = _conv3(p["conv1"], silu(h))
    h = group_norm(p["norm2"], h, cfg.norm_groups, cfg.norm_eps)
    h = _conv3(p["conv2"], silu(h))
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": norm_init(c, dtype),
        "to_q": linear_init(ks[0], c, c, dtype),
        "to_k": linear_init(ks[1], c, c, dtype),
        "to_v": linear_init(ks[2], c, c, dtype),
        "to_out": linear_init(ks[3], c, c, dtype),
    }


def _attn(p, x, cfg: VAEConfig):
    """Single-head spatial self-attention (VAE mid block)."""
    n, h, w, c = x.shape
    hidden = group_norm(p["group_norm"], x, cfg.norm_groups, cfg.norm_eps)
    hidden = hidden.reshape(n, h * w, c)
    q = linear(p["to_q"], hidden)
    k = linear(p["to_k"], hidden)
    v = linear(p["to_v"], hidden)
    # S = latent H·W (≈6.9k at res 768); XLA would materialize the [S,S]
    # score matrix (~190 MB fp32) in HBM both directions. flash_attention
    # handles d=512 (full-depth MXU contractions) and falls back to the XLA
    # path off-TPU / at short S.
    out = flash_attention(q, k, v, num_heads=1)
    out = linear(p["to_out"], out).reshape(n, h, w, c)
    return x + out


def init_vae(key, config: VAEConfig, dtype=jnp.float32):
    cfg = config
    chans = cfg.block_out_channels
    n_stages = len(chans)
    keys = iter(jax.random.split(key, 256))

    # Encoder
    enc: dict = {"conv_in": conv_init(next(keys), 3, 3, cfg.in_channels, chans[0], dtype)}
    down = []
    cin = chans[0]
    for i in range(n_stages):
        cout = chans[i]
        stage = {"resnets": []}
        for _ in range(cfg.layers_per_block):
            stage["resnets"].append(_resnet_init(next(keys), cin, cout, dtype))
            cin = cout
        if i < n_stages - 1:
            stage["downsampler"] = conv_init(next(keys), 3, 3, cout, cout, dtype)
        down.append(stage)
    enc["down_blocks"] = down
    c_mid = chans[-1]
    enc["mid_block"] = {
        "resnets": [
            _resnet_init(next(keys), c_mid, c_mid, dtype),
            _resnet_init(next(keys), c_mid, c_mid, dtype),
        ],
        "attentions": [_attn_init(next(keys), c_mid, dtype)],
    }
    enc["conv_norm_out"] = norm_init(c_mid, dtype)
    enc["conv_out"] = conv_init(next(keys), 3, 3, c_mid, 2 * cfg.latent_channels, dtype)

    # Decoder
    dec: dict = {"conv_in": conv_init(next(keys), 3, 3, cfg.latent_channels, c_mid, dtype)}
    dec["mid_block"] = {
        "resnets": [
            _resnet_init(next(keys), c_mid, c_mid, dtype),
            _resnet_init(next(keys), c_mid, c_mid, dtype),
        ],
        "attentions": [_attn_init(next(keys), c_mid, dtype)],
    }
    up = []
    cin = c_mid
    for i in range(n_stages):
        cout = chans[n_stages - 1 - i]
        stage = {"resnets": []}
        for _ in range(cfg.layers_per_block + 1):
            stage["resnets"].append(_resnet_init(next(keys), cin, cout, dtype))
            cin = cout
        if i < n_stages - 1:
            stage["upsampler"] = conv_init(next(keys), 3, 3, cout, cout, dtype)
        up.append(stage)
    dec["up_blocks"] = up
    dec["conv_norm_out"] = norm_init(chans[0], dtype)
    dec["conv_out"] = conv_init(next(keys), 3, 3, chans[0], cfg.in_channels, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv_init(
            next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels, dtype
        ),
        "post_quant_conv": conv_init(
            next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels, dtype
        ),
    }


def encode(params, images: jnp.ndarray, config: VAEConfig) -> jnp.ndarray:
    """[-1,1] NHWC images → scaled latent (posterior mean · scaling_factor).

    Deterministic mode-encode as Marigold's ``prepare_latents`` does
    (reference marigold_dc.py:696-698 via the pipeline base class).
    """
    cfg = config
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], images)
    for stage in enc["down_blocks"]:
        for p in stage["resnets"]:
            h = _resnet(p, h, cfg)
        if "downsampler" in stage:
            # SD VAE downsample uses asymmetric (0,1) padding
            h = conv2d(stage["downsampler"], h, stride=2, padding=((0, 1), (0, 1)))
    mid = enc["mid_block"]
    h = _resnet(mid["resnets"][0], h, cfg)
    h = _attn(mid["attentions"][0], h, cfg)
    h = _resnet(mid["resnets"][1], h, cfg)
    h = group_norm(enc["conv_norm_out"], h, cfg.norm_groups, cfg.norm_eps)
    moments = conv2d(enc["conv_out"], silu(h))
    moments = conv2d(params["quant_conv"], moments, padding=0)
    mean = moments[..., : cfg.latent_channels]
    return mean * cfg.scaling_factor


def _decode_backbone(params, latents: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """Shared decoder trunk: latent → pre-``conv_out`` activations [N,H,W,C]."""
    z = latents / cfg.scaling_factor
    z = conv2d(params["post_quant_conv"], z, padding=0)
    dec = params["decoder"]
    h = conv2d(dec["conv_in"], z)
    mid = dec["mid_block"]
    h = _resnet(mid["resnets"][0], h, cfg)
    h = _attn(mid["attentions"][0], h, cfg)
    h = _resnet(mid["resnets"][1], h, cfg)
    for stage in dec["up_blocks"]:
        for p in stage["resnets"]:
            h = _resnet(p, h, cfg)
        if "upsampler" in stage:
            # upsample+conv as four subpixel 2×2-tap dot_generals — exactly
            # conv2d(upsample_nearest_2x(h)); the fused-broadcast conv XLA
            # would otherwise emit runs at ~32 TF/s in-graph (PERF.md).
            h = upsample_conv_2x_matmul(stage["upsampler"], h)
    h = group_norm(dec["conv_norm_out"], h, cfg.norm_groups, cfg.norm_eps)
    return silu(h)


def decode(params, latents: jnp.ndarray, config: VAEConfig) -> jnp.ndarray:
    """Scaled latent → NHWC image in [-1,1] (differentiable guidance path)."""
    h = _decode_backbone(params, latents, config)
    return conv2d(params["decoder"]["conv_out"], h)


def decode_depth(params, latents: jnp.ndarray, config: VAEConfig) -> jnp.ndarray:
    """Latent → [0,1] depth [N,H,W,1] — the Marigold decode head fused.

    Exactly ``clip(mean_rgb(decode(latents)), -1, 1)·0.5 + 0.5`` (reference
    marigold_dc.py:373-430 semantics) with the channel mean folded into
    ``conv_out`` via the tap matmul (layers.conv3x3_mean_tap): decode emits
    [-1,1] RGB here, so depth = clip((m̄+1)/2, 0, 1).
    """
    h = _decode_backbone(params, latents, config)
    m = conv3x3_mean_tap(params["decoder"]["conv_out"], h)
    return jnp.clip(0.5 * m + 0.5, 0.0, 1.0)[..., None]
