"""KL-VAE and TAESD parity against independent torch builds (diffusers names)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from depth_completion_tpu.models import vae_kl, vae_tiny
from depth_completion_tpu.models.registry import TaesdConfig, VAEConfig
from depth_completion_tpu.models.weights import convert_taesd_state, convert_vae_state

VCFG = VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_groups=8)
TCFG = TaesdConfig(channels=16, encoder_blocks=(1, 2), decoder_blocks=(2, 1))


class VResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(VCFG.norm_groups, cin, eps=VCFG.norm_eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(VCFG.norm_groups, cout, eps=VCFG.norm_eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return (x if self.conv_shortcut is None else self.conv_shortcut(x)) + h


class VAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(VCFG.norm_groups, c, eps=VCFG.norm_eps)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        n, c, h, w = x.shape
        hidden = self.group_norm(x).permute(0, 2, 3, 1).reshape(n, h * w, c)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        out = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        out = self.to_out[0](out)
        return x + out.reshape(n, h, w, c).permute(0, 3, 1, 2)


class TEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        chans = VCFG.block_out_channels
        self.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        cin = chans[0]
        for i, cout in enumerate(chans):
            stage = nn.Module()
            stage.resnets = nn.ModuleList()
            for _ in range(VCFG.layers_per_block):
                stage.resnets.append(VResnet(cin, cout))
                cin = cout
            if i < len(chans) - 1:
                stage.downsamplers = nn.ModuleList([nn.Module()])
                stage.downsamplers[0].conv = nn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.down_blocks.append(stage)
        c = chans[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([VResnet(c, c), VResnet(c, c)])
        self.mid_block.attentions = nn.ModuleList([VAttn(c)])
        self.conv_norm_out = nn.GroupNorm(VCFG.norm_groups, c, eps=VCFG.norm_eps)
        self.conv_out = nn.Conv2d(c, 2 * VCFG.latent_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for stage in self.down_blocks:
            for res in stage.resnets:
                h = res(h)
            if hasattr(stage, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))
                h = stage.downsamplers[0].conv(h)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        chans = VCFG.block_out_channels
        c = chans[-1]
        self.conv_in = nn.Conv2d(VCFG.latent_channels, c, 3, padding=1)
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([VResnet(c, c), VResnet(c, c)])
        self.mid_block.attentions = nn.ModuleList([VAttn(c)])
        self.up_blocks = nn.ModuleList()
        cin = c
        for i in range(len(chans)):
            cout = chans[len(chans) - 1 - i]
            stage = nn.Module()
            stage.resnets = nn.ModuleList()
            for _ in range(VCFG.layers_per_block + 1):
                stage.resnets.append(VResnet(cin, cout))
                cin = cout
            if i < len(chans) - 1:
                stage.upsamplers = nn.ModuleList([nn.Module()])
                stage.upsamplers[0].conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.up_blocks.append(stage)
        self.conv_norm_out = nn.GroupNorm(VCFG.norm_groups, chans[0], eps=VCFG.norm_eps)
        self.conv_out = nn.Conv2d(chans[0], 3, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        for stage in self.up_blocks:
            for res in stage.resnets:
                h = res(h)
            if hasattr(stage, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = stage.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TKLVAE(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TEncoder()
        self.decoder = TDecoder()
        self.quant_conv = nn.Conv2d(2 * VCFG.latent_channels, 2 * VCFG.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(VCFG.latent_channels, VCFG.latent_channels, 1)


def test_kl_vae_matches_torch():
    torch.manual_seed(0)
    model = TKLVAE().eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    tree = convert_vae_state(state, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, size=(1, 16, 24, 3)).astype(np.float32)
    lat = np.asarray(vae_kl.encode(tree, jnp.asarray(img), VCFG))
    with torch.no_grad():
        moments = model.quant_conv(model.encoder(torch.from_numpy(img).permute(0, 3, 1, 2)))
        mean = moments[:, : VCFG.latent_channels]
        ref_lat = (mean * VCFG.scaling_factor).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(lat, ref_lat, rtol=2e-3, atol=2e-4)

    rec = np.asarray(vae_kl.decode(tree, jnp.asarray(lat), VCFG))
    with torch.no_grad():
        z = torch.from_numpy(lat).permute(0, 3, 1, 2) / VCFG.scaling_factor
        ref_rec = model.decoder(model.post_quant_conv(z)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(rec, ref_rec, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# TAESD
# ---------------------------------------------------------------------------


def _t_block(c):
    block = nn.Module()
    block.conv = nn.Sequential(
        nn.Conv2d(c, c, 3, padding=1), nn.ReLU(),
        nn.Conv2d(c, c, 3, padding=1), nn.ReLU(),
        nn.Conv2d(c, c, 3, padding=1),
    )
    block.forward = lambda x, block=block: F.relu(block.conv(x) + x)
    return block


class TTaesd(nn.Module):
    def __init__(self):
        super().__init__()
        c, lc = TCFG.channels, TCFG.latent_channels
        enc_layers = [nn.Conv2d(3, c, 3, padding=1)]
        for i, n in enumerate(TCFG.encoder_blocks):
            if i > 0:
                enc_layers.append(nn.Conv2d(c, c, 3, stride=2, padding=1, bias=False))
            for _ in range(n):
                enc_layers.append(_t_block(c))
        enc_layers.append(nn.Conv2d(c, lc, 3, padding=1))
        self.encoder = nn.Module()
        self.encoder.layers = nn.Sequential(*enc_layers)

        dec_layers = [nn.Conv2d(lc, c, 3, padding=1), nn.ReLU()]
        for i, n in enumerate(TCFG.decoder_blocks):
            for _ in range(n):
                dec_layers.append(_t_block(c))
            if i < len(TCFG.decoder_blocks) - 1:
                dec_layers.append(nn.Upsample(scale_factor=2, mode="nearest"))
                dec_layers.append(nn.Conv2d(c, c, 3, padding=1, bias=False))
        dec_layers.append(nn.Conv2d(c, 3, 3, padding=1))
        self.decoder = nn.Module()
        self.decoder.layers = nn.Sequential(*dec_layers)

    def encode(self, x):
        return self.encoder.layers(x.add(1).div(2))

    def decode(self, z):
        z = torch.tanh(z / 3) * 3
        return self.decoder.layers(z).mul(2).sub(1)


def test_taesd_matches_torch():
    torch.manual_seed(1)
    model = TTaesd().eval()
    # torch applies Block.forward via the module __call__; our lambda trick
    # needs explicit invocation — run layers manually for the reference:
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    tree = convert_taesd_state(
        state,
        encoder_blocks=TCFG.encoder_blocks,
        decoder_blocks=TCFG.decoder_blocks,
        dtype=jnp.float32,
    )

    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    lat = np.asarray(vae_tiny.encode(tree, jnp.asarray(img), TCFG))
    with torch.no_grad():
        ref_lat = model.encode(torch.from_numpy(img).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(lat, ref_lat, rtol=2e-3, atol=2e-4)

    rec = np.asarray(vae_tiny.decode(tree, jnp.asarray(lat), TCFG))
    with torch.no_grad():
        ref_rec = model.decode(torch.from_numpy(lat).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(rec, ref_rec, rtol=5e-3, atol=5e-4)


def test_wpacked_conv_exact():
    """Width-packed conv (TPU lane-filling decode path) ≡ plain conv to
    float64 machine precision, including zero-pad boundaries and bias."""
    import jax

    from depth_completion_tpu.models.layers import conv2d
    from depth_completion_tpu.models.vae_tiny import (
        _conv2d_wpacked,
        _upsample_2x_wpacked,
        _wpack,
        _wunpack,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 16)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.normal(size=(3, 3, 16, 16)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(16,)), jnp.float32),
    }
    ref = conv2d(p, x)
    packed = _wunpack(_conv2d_wpacked(p, _wpack(x)))
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # packed upsample ≡ nearest-2x on the unpacked tensor
    from depth_completion_tpu.models.layers import upsample_nearest_2x

    up_ref = upsample_nearest_2x(x)
    up_packed = _wunpack(_upsample_2x_wpacked(_wpack(x)))
    np.testing.assert_array_equal(np.asarray(up_packed), np.asarray(up_ref))

    # gradient flows identically
    g1 = jax.grad(
        lambda x: float(0) + jnp.sum(
            jnp.sin(_wunpack(_conv2d_wpacked(p, _wpack(x))))
        )
    )(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(conv2d(p, x))))(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-4
    )


def test_taesd_decode_odd_width_fallback():
    """Odd post-conv_in widths use the plain path and still decode."""
    import jax

    from depth_completion_tpu.models.registry import TAESD_CONFIG
    from depth_completion_tpu.models.vae_tiny import decode, init_taesd

    params = init_taesd(jax.random.PRNGKey(0), TAESD_CONFIG, jnp.float32)
    lat = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 5, 4)), jnp.float32
    )  # odd latent width
    out = decode(params, lat, TAESD_CONFIG)
    assert out.shape == (1, 32, 40, 3)
    assert np.isfinite(np.asarray(out)).all()
