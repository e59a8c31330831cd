"""SD2-class conditional UNet — the Marigold denoiser, TPU-native.

Re-implements the capability of diffusers' ``UNet2DConditionModel`` as used
by the reference (marigold_dc.py:432-465): 8 input channels (image latent ⊕
depth latent concatenated by the caller), 4 output channels, cross-attention
over CLIP hidden states, v-prediction output.

Structure (mirrors the checkpoint layout for mechanical weight mapping, but
executes as pure functions over an NHWC pytree):

- conv_in → [down stages: resnet (+transformer) ×L, downsample] → mid
  (resnet, transformer, resnet) → [up stages: skip-concat resnet
  (+transformer) ×(L+1), upsample] → GN → silu → conv_out
- transformer block: LN → self-attn → LN → cross-attn → LN → GEGLU MLP,
  with linear proj_in/out (SD2 ``use_linear_projection``).

Performance notes: attention runs through ``layers.attention`` (fp32 softmax,
MXU matmuls) and is swapped for a fused Pallas flash kernel on TPU via the
``attention_fn`` argument; ``jax.checkpoint`` is applied per down/up stage by
the sampling loop when differentiating through the UNet (the guidance
gradient path, reference marigold_dc.py:875-877).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from depth_completion_tpu.models.layers import (
    attention,
    conv2d,
    conv_init,
    group_norm,
    layer_norm,
    linear,
    linear_init,
    norm_init,
    silu,
    timestep_embedding,
    upsample_conv_2x_matmul,
)
from depth_completion_tpu.models.registry import UNetConfig

AttentionFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, int], jnp.ndarray]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _resnet_init(key, cin, cout, temb_dim, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": norm_init(cin, dtype),
        "conv1": conv_init(ks[0], 3, 3, cin, cout, dtype),
        "time_emb_proj": linear_init(ks[1], temb_dim, cout, dtype),
        "norm2": norm_init(cout, dtype),
        "conv2": conv_init(ks[2], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = conv_init(ks[3], 1, 1, cin, cout, dtype)
    return p


def _attn_init(key, c, kv_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "to_q": linear_init(ks[0], c, c, dtype, use_bias=False),
        "to_k": linear_init(ks[1], kv_dim, c, dtype, use_bias=False),
        "to_v": linear_init(ks[2], kv_dim, c, dtype, use_bias=False),
        "to_out": linear_init(ks[3], c, c, dtype),
    }


def _transformer_init(key, c, cfg: UNetConfig, dtype):
    ks = jax.random.split(key, 3 + cfg.transformer_layers)
    blocks = []
    for i in range(cfg.transformer_layers):
        kb = jax.random.split(ks[3 + i], 4)
        blocks.append(
            {
                "norm1": norm_init(c, dtype),
                "attn1": _attn_init(kb[0], c, c, dtype),
                "norm2": norm_init(c, dtype),
                "attn2": _attn_init(kb[1], c, cfg.cross_attention_dim, dtype),
                "norm3": norm_init(c, dtype),
                "ff": {
                    "proj_in": linear_init(kb[2], c, c * 8, dtype),
                    "proj_out": linear_init(kb[3], c * 4, c, dtype),
                },
            }
        )
    return {
        "norm": norm_init(c, dtype),
        "proj_in": linear_init(ks[0], c, c, dtype),
        "blocks": blocks,
        "proj_out": linear_init(ks[1], c, c, dtype),
    }


def init_unet(key, config: UNetConfig, dtype=jnp.float32):
    """Random-init the full UNet parameter pytree."""
    cfg = config
    temb_dim = cfg.time_embed_dim
    n_stages = len(cfg.block_out_channels)
    keys = iter(jax.random.split(key, 1024))

    params: dict = {
        "conv_in": conv_init(
            next(keys), 3, 3, cfg.in_channels, cfg.block_out_channels[0], dtype
        ),
        "time_embedding": {
            "linear_1": linear_init(next(keys), cfg.block_out_channels[0], temb_dim, dtype),
            "linear_2": linear_init(next(keys), temb_dim, temb_dim, dtype),
        },
    }

    # Down path
    down_blocks = []
    skip_channels = [cfg.block_out_channels[0]]
    cin = cfg.block_out_channels[0]
    for i in range(n_stages):
        cout = cfg.block_out_channels[i]
        stage: dict = {"resnets": [], "attentions": []}
        for _ in range(cfg.layers_per_block):
            stage["resnets"].append(_resnet_init(next(keys), cin, cout, temb_dim, dtype))
            cin = cout
            if cfg.attention_stages[i]:
                stage["attentions"].append(_transformer_init(next(keys), cout, cfg, dtype))
            skip_channels.append(cout)
        if i < n_stages - 1:
            stage["downsampler"] = conv_init(next(keys), 3, 3, cout, cout, dtype)
            skip_channels.append(cout)
        down_blocks.append(stage)
    params["down_blocks"] = down_blocks

    # Mid
    c_mid = cfg.block_out_channels[-1]
    params["mid_block"] = {
        "resnets": [
            _resnet_init(next(keys), c_mid, c_mid, temb_dim, dtype),
            _resnet_init(next(keys), c_mid, c_mid, temb_dim, dtype),
        ],
        "attentions": [_transformer_init(next(keys), c_mid, cfg, dtype)],
    }

    # Up path
    up_blocks = []
    cin = c_mid
    for i in range(n_stages):
        stage_idx = n_stages - 1 - i  # mirror of the down stage
        cout = cfg.block_out_channels[stage_idx]
        stage = {"resnets": [], "attentions": []}
        for _ in range(cfg.layers_per_block + 1):
            skip_c = skip_channels.pop()
            stage["resnets"].append(
                _resnet_init(next(keys), cin + skip_c, cout, temb_dim, dtype)
            )
            cin = cout
            if cfg.attention_stages[stage_idx]:
                stage["attentions"].append(_transformer_init(next(keys), cout, cfg, dtype))
        if i < n_stages - 1:
            stage["upsampler"] = conv_init(next(keys), 3, 3, cout, cout, dtype)
        up_blocks.append(stage)
    params["up_blocks"] = up_blocks

    params["conv_norm_out"] = norm_init(cfg.block_out_channels[0], dtype)
    params["conv_out"] = conv_init(
        next(keys), 3, 3, cfg.block_out_channels[0], cfg.out_channels, dtype
    )
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _resnet(p, x, temb, cfg: UNetConfig):
    h = group_norm(p["norm1"], x, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(p["conv1"], silu(h))
    t = linear(p["time_emb_proj"], silu(temb))  # [N, cout]
    h = h + t[:, None, None, :]
    h = group_norm(p["norm2"], h, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(p["conv2"], silu(h))
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _geglu_ff(p, x):
    h = linear(p["proj_in"], x)
    val, gate = jnp.split(h, 2, axis=-1)
    h = val * jax.nn.gelu(gate)
    return linear(p["proj_out"], h)


def _transformer(p, x, ctx, num_heads, cfg: UNetConfig, attention_fn: AttentionFn):
    """Spatial transformer over NHWC input with linear proj in/out."""
    n, h, w, c = x.shape
    residual = x
    hidden = group_norm(p["norm"], x, cfg.norm_groups, eps=1e-6)
    hidden = hidden.reshape(n, h * w, c)
    hidden = linear(p["proj_in"], hidden)
    for blk in p["blocks"]:
        # self-attention
        hn = layer_norm(blk["norm1"], hidden)
        q = linear(blk["attn1"]["to_q"], hn)
        k = linear(blk["attn1"]["to_k"], hn)
        v = linear(blk["attn1"]["to_v"], hn)
        hidden = hidden + linear(blk["attn1"]["to_out"], attention_fn(q, k, v, num_heads))
        # cross-attention
        hn = layer_norm(blk["norm2"], hidden)
        q = linear(blk["attn2"]["to_q"], hn)
        k = linear(blk["attn2"]["to_k"], ctx)
        v = linear(blk["attn2"]["to_v"], ctx)
        hidden = hidden + linear(blk["attn2"]["to_out"], attention_fn(q, k, v, num_heads))
        # feed-forward
        hidden = hidden + _geglu_ff(blk["ff"], layer_norm(blk["norm3"], hidden))
    hidden = linear(p["proj_out"], hidden)
    return hidden.reshape(n, h, w, c) + residual


def apply_unet(
    params,
    sample: jnp.ndarray,
    timestep: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    config: UNetConfig,
    attention_fn: AttentionFn = attention,
    remat: bool = False,
) -> jnp.ndarray:
    """UNet forward: [N,EH,EW,Cin], scalar/[N] t, [N,S,D] context → [N,EH,EW,4].

    ``remat=True`` wraps each stage in ``jax.checkpoint`` — used when the
    guidance loss differentiates through the UNet (the per-step training path,
    reference marigold_dc.py:806-877) to keep activation memory bounded.
    """
    cfg = config
    n = sample.shape[0]
    if timestep.ndim == 0:
        timestep = jnp.broadcast_to(timestep, (n,))
    temb = timestep_embedding(timestep, cfg.block_out_channels[0])
    temb = temb.astype(sample.dtype)
    temb = linear(params["time_embedding"]["linear_1"], temb)
    temb = linear(params["time_embedding"]["linear_2"], silu(temb))

    ctx = encoder_hidden_states.astype(sample.dtype)
    n_stages = len(cfg.block_out_channels)

    def run_down_stage(i, stage, h):
        skips = []
        for j, res_p in enumerate(stage["resnets"]):
            h = _resnet(res_p, h, temb, cfg)
            if cfg.attention_stages[i]:
                h = _transformer(
                    stage["attentions"][j], h, ctx, cfg.num_heads[i], cfg, attention_fn
                )
            skips.append(h)
        if "downsampler" in stage:
            h = conv2d(stage["downsampler"], h, stride=2, padding=1)
            skips.append(h)
        return h, skips

    def run_up_stage(i, stage, h, stage_skips, up_target):
        """``stage_skips`` is newest-first: resnet j consumes stage_skips[j].

        ``up_target``: spatial (H, W) the upsample must produce — the next
        stage's skip size. Odd down-path sizes (e.g. KITTI's 28-high latent:
        28→14→7→4) make this differ from plain 2×; diffusers handles the
        same case via its ``forward_upsample_size`` path.
        """
        stage_idx = n_stages - 1 - i
        for j, res_p in enumerate(stage["resnets"]):
            h = jnp.concatenate([h, stage_skips[j]], axis=-1)
            h = _resnet(res_p, h, temb, cfg)
            if cfg.attention_stages[stage_idx]:
                h = _transformer(
                    stage["attentions"][j], h, ctx, cfg.num_heads[stage_idx], cfg, attention_fn
                )
        if "upsampler" in stage:
            th, tw = up_target
            if (th, tw) == (h.shape[1] * 2, h.shape[2] * 2):
                # subpixel matmul formulation: exactly upsample+conv3x3 but
                # 2.25x fewer MACs and no fused-broadcast conv slow path
                # (PERF.md round 2); measured faster in- and out-of-graph.
                h = upsample_conv_2x_matmul(stage["upsampler"], h)
            else:
                # odd-size targets (diffusers forward_upsample_size case)
                h = jax.image.resize(
                    h, (h.shape[0], th, tw, h.shape[3]), method="nearest"
                )
                h = conv2d(stage["upsampler"], h)
        return h

    def maybe_ckpt(f, static=(0,)):
        return jax.checkpoint(f, static_argnums=static) if remat else f

    h = conv2d(params["conv_in"], sample)
    skips = [h]
    for i, stage in enumerate(params["down_blocks"]):
        h, new_skips = maybe_ckpt(lambda i_, s_, h_: run_down_stage(i_, s_, h_))(
            i, stage, h
        )
        skips.extend(new_skips)

    mid = params["mid_block"]
    h = _resnet(mid["resnets"][0], h, temb, cfg)
    h = _transformer(
        mid["attentions"][0], h, ctx, cfg.num_heads[-1], cfg, attention_fn
    )
    h = _resnet(mid["resnets"][1], h, temb, cfg)

    for i, stage in enumerate(params["up_blocks"]):
        n_res = len(stage["resnets"])
        stage_skips = tuple(skips.pop() for _ in range(n_res))  # newest-first
        # upsample target = the next stage's first skip (static shape)
        up_target = skips[-1].shape[1:3] if skips else None
        h = maybe_ckpt(
            lambda i_, s_, h_, sk_, t_: run_up_stage(i_, s_, h_, sk_, t_),
            static=(0, 4),
        )(i, stage, h, stage_skips, up_target)

    h = group_norm(params["conv_norm_out"], h, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(params["conv_out"], silu(h))
    return h
