"""UNet topology/weight-mapping parity against an independent torch build.

diffusers is not installed here, so this test builds the SD2-class UNet
topology independently in torch (following the architecture definition:
resnet blocks with time embedding, linear-projection spatial transformers
with GEGLU, strided-conv down / nearest-up sampling, skip concatenation),
names its parameters with diffusers' state-dict keys, converts through
``weights.convert_unet_state``, and requires matching outputs. This guards
the block wiring, skip ordering, normalization placement, and every
transpose in the converter.
"""

import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from depth_completion_tpu.models.registry import UNetConfig
from depth_completion_tpu.models.unet import apply_unet
from depth_completion_tpu.models.weights import convert_unet_state

CFG = UNetConfig(
    in_channels=8,
    out_channels=4,
    block_out_channels=(32, 64),
    num_heads=(2, 4),
    attention_stages=(True, False),
    cross_attention_dim=48,
    layers_per_block=1,
    norm_groups=8,
)


class TResnet(nn.Module):
    def __init__(self, cin, cout, temb):
        super().__init__()
        self.norm1 = nn.GroupNorm(CFG.norm_groups, cin, eps=CFG.norm_eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(CFG.norm_groups, cout, eps=CFG.norm_eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class TAttention(nn.Module):
    def __init__(self, c, kv_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(c, c, bias=False)
        self.to_k = nn.Linear(kv_dim, c, bias=False)
        self.to_v = nn.Linear(kv_dim, c, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        n, s, c = x.shape
        hd = c // self.heads
        q = self.to_q(x).reshape(n, s, self.heads, hd).transpose(1, 2)
        k = self.to_k(ctx).reshape(n, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(ctx).reshape(n, -1, self.heads, hd).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(n, s, c)
        return self.to_out[0](out)


class TGEGLU(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.proj = nn.Linear(c, c * 8)

    def forward(self, x):
        val, gate = self.proj(x).chunk(2, dim=-1)
        return val * F.gelu(gate)


class TTransformerBlock(nn.Module):
    def __init__(self, c, kv_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(c)
        self.attn1 = TAttention(c, c, heads)
        self.norm2 = nn.LayerNorm(c)
        self.attn2 = TAttention(c, kv_dim, heads)
        self.norm3 = nn.LayerNorm(c)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([TGEGLU(c), nn.Identity(), nn.Linear(c * 4, c)])

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff.net[2](self.ff.net[1](self.ff.net[0](self.norm3(x))))
        return x


class TTransformer2D(nn.Module):
    def __init__(self, c, kv_dim, heads):
        super().__init__()
        self.norm = nn.GroupNorm(CFG.norm_groups, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        self.transformer_blocks = nn.ModuleList([TTransformerBlock(c, kv_dim, heads)])
        self.proj_out = nn.Linear(c, c)

    def forward(self, x, ctx):
        n, c, h, w = x.shape
        res = x
        hidden = self.norm(x).permute(0, 2, 3, 1).reshape(n, h * w, c)
        hidden = self.proj_in(hidden)
        for blk in self.transformer_blocks:
            hidden = blk(hidden, ctx)
        hidden = self.proj_out(hidden)
        return hidden.reshape(n, h, w, c).permute(0, 3, 1, 2) + res


def timestep_embedding_t(t, dim):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    freqs = torch.exp(exponent)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TUNet(nn.Module):
    def __init__(self):
        super().__init__()
        cfg = CFG
        temb = cfg.time_embed_dim
        self.conv_in = nn.Conv2d(cfg.in_channels, cfg.block_out_channels[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(cfg.block_out_channels[0], temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)

        self.down_blocks = nn.ModuleList()
        skips = [cfg.block_out_channels[0]]
        cin = cfg.block_out_channels[0]
        for i, cout in enumerate(cfg.block_out_channels):
            stage = nn.Module()
            stage.resnets = nn.ModuleList()
            stage.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                stage.resnets.append(TResnet(cin, cout, temb))
                cin = cout
                if cfg.attention_stages[i]:
                    stage.attentions.append(
                        TTransformer2D(cout, cfg.cross_attention_dim, cfg.num_heads[i])
                    )
                skips.append(cout)
            if i < len(cfg.block_out_channels) - 1:
                stage.downsamplers = nn.ModuleList([nn.Module()])
                stage.downsamplers[0].conv = nn.Conv2d(cout, cout, 3, stride=2, padding=1)
                skips.append(cout)
            self.down_blocks.append(stage)

        c_mid = cfg.block_out_channels[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TResnet(c_mid, c_mid, temb), TResnet(c_mid, c_mid, temb)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [TTransformer2D(c_mid, cfg.cross_attention_dim, cfg.num_heads[-1])]
        )

        self.up_blocks = nn.ModuleList()
        cin = c_mid
        n_stages = len(cfg.block_out_channels)
        for i in range(n_stages):
            stage_idx = n_stages - 1 - i
            cout = cfg.block_out_channels[stage_idx]
            stage = nn.Module()
            stage.resnets = nn.ModuleList()
            stage.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip_c = skips.pop()
                stage.resnets.append(TResnet(cin + skip_c, cout, temb))
                cin = cout
                if cfg.attention_stages[stage_idx]:
                    stage.attentions.append(
                        TTransformer2D(cout, cfg.cross_attention_dim, cfg.num_heads[stage_idx])
                    )
            if i < n_stages - 1:
                stage.upsamplers = nn.ModuleList([nn.Module()])
                stage.upsamplers[0].conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.up_blocks.append(stage)

        self.conv_norm_out = nn.GroupNorm(CFG.norm_groups, cfg.block_out_channels[0], eps=CFG.norm_eps)
        self.conv_out = nn.Conv2d(cfg.block_out_channels[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx):
        cfg = CFG
        temb = timestep_embedding_t(t, cfg.block_out_channels[0])
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        skips = [h]
        for i, stage in enumerate(self.down_blocks):
            for j, res in enumerate(stage.resnets):
                h = res(h, temb)
                if cfg.attention_stages[i]:
                    h = stage.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(stage, "downsamplers"):
                h = stage.downsamplers[0].conv(h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        n_stages = len(cfg.block_out_channels)
        for i, stage in enumerate(self.up_blocks):
            stage_idx = n_stages - 1 - i
            for j, res in enumerate(stage.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if cfg.attention_stages[stage_idx]:
                    h = stage.attentions[j](h, ctx)
            if hasattr(stage, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = stage.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def test_unet_matches_torch_reference():
    torch.manual_seed(0)
    model = TUNet().eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    tree = convert_unet_state(state, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 24, CFG.in_channels)).astype(np.float32)
    ctx = rng.normal(size=(2, 3, CFG.cross_attention_dim)).astype(np.float32)
    t = np.asarray([700, 700], dtype=np.int32)

    ours = np.asarray(
        apply_unet(tree, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), CFG)
    )
    with torch.no_grad():
        ref = (
            model(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(t),
                torch.from_numpy(ctx),
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)
