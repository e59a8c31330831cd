"""Model shape/geometry tests on tiny configs (CPU-fast)."""

import numpy as np
import jax
import jax.numpy as jnp

from depth_completion_tpu.models import registry, vae_kl, vae_tiny
from depth_completion_tpu.models.clip_text import (
    apply_text_encoder,
    empty_prompt_ids,
    init_text_encoder,
)
from depth_completion_tpu.models.unet import apply_unet, init_unet


def test_unet_shapes_and_determinism():
    cfg = registry.TINY_UNET_CONFIG
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 2, cfg.cross_attention_dim))
    t = jnp.asarray(500)
    out = apply_unet(params, x, t, ctx, cfg)
    assert out.shape == (2, 16, 24, cfg.out_channels)
    out2 = apply_unet(params, x, t, ctx, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_unet_remat_matches_no_remat():
    cfg = registry.TINY_UNET_CONFIG
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 2, cfg.cross_attention_dim))
    t = jnp.asarray(100)
    a = apply_unet(params, x, t, ctx, cfg, remat=False)
    b = apply_unet(params, x, t, ctx, cfg, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_grad_flows_to_input():
    cfg = registry.TINY_UNET_CONFIG
    params = init_unet(jax.random.PRNGKey(0), cfg)
    ctx = jnp.zeros((1, 2, cfg.cross_attention_dim))

    def f(x):
        return jnp.sum(apply_unet(params, x, jnp.asarray(10), ctx, cfg, remat=True))

    g = jax.grad(f)(jnp.ones((1, 16, 16, cfg.in_channels)) * 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_kl_vae_roundtrip_shapes():
    cfg = registry.TINY_VAE_CONFIG
    params = vae_kl.init_vae(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 48, 3), minval=-1, maxval=1)
    lat = vae_kl.encode(params, img, cfg)
    # tiny config has 2 stages → 2× downsample; SD config (4 stages) gives 8×
    assert lat.shape == (1, 16, 24, cfg.latent_channels)
    rec = vae_kl.decode(params, lat, cfg)
    assert rec.shape == img.shape


def test_sd_vae_is_8x():
    """Full SD VAE geometry: 8× spatial downsample (marigold_dc.py:596-597)."""
    cfg = registry.SD_VAE_CONFIG
    assert 2 ** (len(cfg.block_out_channels) - 1) == 8


def test_taesd_roundtrip_shapes_and_grad():
    cfg = registry.TINY_TAESD_CONFIG
    params = vae_tiny.init_taesd(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3), minval=-1, maxval=1)
    lat = vae_tiny.encode(params, img, cfg)
    assert lat.shape == (1, 8, 8, cfg.latent_channels)  # 2 stages → 2×
    rec = vae_tiny.decode(params, lat, cfg)
    assert rec.shape == img.shape

    def f(z):
        return jnp.sum(vae_tiny.decode(params, z, cfg))

    g = jax.grad(f)(lat)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_taesd_decode_depth_matches_composition():
    """Fused depth head ≡ decode → mean_rgb → clip → (x+1)/2 (both parities)."""
    cfg = registry.TINY_TAESD_CONFIG
    params = vae_tiny.init_taesd(jax.random.PRNGKey(0), cfg)
    for hw in ((8, 8), (8, 7)):  # even (packed) and odd (plain) widths
        lat = 2.0 * jax.random.normal(
            jax.random.PRNGKey(2), (2, *hw, cfg.latent_channels)
        )
        rgb = vae_tiny.decode(params, lat, cfg)
        ref = (jnp.clip(jnp.mean(rgb, axis=-1, keepdims=True), -1, 1) + 1) / 2
        fused = vae_tiny.decode_depth(params, lat, cfg)
        assert fused.shape == ref.shape
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-6)

    # gradient flows through the fused head
    g = jax.grad(lambda z: jnp.sum(vae_tiny.decode_depth(params, z, cfg)))(lat)
    assert np.isfinite(np.asarray(g)).all()


def test_kl_decode_depth_matches_composition():
    """KL fused depth head ≡ decode → mean_rgb → clip → (x+1)/2."""
    from depth_completion_tpu.models import vae_kl

    cfg = registry.TINY_VAE_CONFIG
    params = vae_kl.init_vae(jax.random.PRNGKey(0), cfg)
    lat = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (2, 6, 7, cfg.latent_channels))
    rgb = vae_kl.decode(params, lat, cfg)
    ref = (jnp.clip(jnp.mean(rgb, axis=-1, keepdims=True), -1, 1) + 1) / 2
    fused = vae_kl.decode_depth(params, lat, cfg)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-6)
    # gradient equivalence on the guidance path (square loss makes the
    # cotangent data-dependent so the head conv can't be folded away)
    def loss_fused(z):
        return jnp.sum(jnp.square(vae_kl.decode_depth(params, z, cfg)))

    def loss_composed(z):
        rgb = vae_kl.decode(params, z, cfg)
        d = (jnp.clip(jnp.mean(rgb, axis=-1, keepdims=True), -1, 1) + 1) / 2
        return jnp.sum(jnp.square(d))

    g = jax.grad(loss_fused)(lat)
    g_ref = jax.grad(loss_composed)(lat)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_text_encoder_shapes():
    cfg = registry.TINY_TEXT_CONFIG
    params = init_text_encoder(jax.random.PRNGKey(0), cfg)
    ids = jnp.minimum(jnp.asarray(empty_prompt_ids(cfg)), cfg.vocab_size - 1)
    out = apply_text_encoder(params, ids, cfg)
    assert out.shape == (1, 2, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_empty_prompt_is_bos_eos():
    cfg = registry.SD2_TEXT_CONFIG
    ids = empty_prompt_ids(cfg)
    assert ids.tolist() == [[49406, 49407]]


def test_unet_multi_transformer_layers():
    """SDXL-style config: transformer_layers=2 per attention block."""
    cfg = registry.UNetConfig(
        block_out_channels=(32, 64),
        num_heads=(2, 4),
        attention_stages=(True, True),
        cross_attention_dim=32,
        layers_per_block=1,
        norm_groups=8,
        transformer_layers=2,
    )
    params = init_unet(jax.random.PRNGKey(0), cfg)
    # both inner transformer blocks exist
    assert len(params["down_blocks"][0]["attentions"][0]["blocks"]) == 2
    out = apply_unet(
        params,
        jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, cfg.in_channels)),
        jnp.asarray(3),
        jnp.zeros((1, 2, cfg.cross_attention_dim)),
        cfg,
    )
    assert out.shape == (1, 16, 16, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_odd_latent_geometry():
    """KITTI-class latent heights (not divisible by 2^stages) must work:
    the up path upsamples to the skip's size, as diffusers'
    forward_upsample_size does (e.g. 28 -> 14 -> 7 -> 4 -> 7 -> 14 -> 28)."""
    cfg = registry.UNetConfig(
        block_out_channels=(8, 8, 8, 8),
        num_heads=(1, 1, 1, 1),
        attention_stages=(False, False, False, False),
        layers_per_block=1,
        norm_groups=4,
    )
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 96, cfg.in_channels))
    ctx = jnp.zeros((1, 2, cfg.cross_attention_dim))
    for remat in (False, True):
        out = apply_unet(params, x, jnp.asarray(10), ctx, cfg, remat=remat)
        assert out.shape == (1, 28, 96, cfg.out_channels)
        assert np.isfinite(np.asarray(out)).all()
