"""Fused conv3x3 Pallas kernel vs the XLA reference (interpreter on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import depth_completion_tpu.ops.conv3x3 as c3


@pytest.fixture(autouse=True)
def interpret_mode():
    c3.INTERPRET = True
    yield
    c3.INTERPRET = False


def _ref(x, k, b=None, relu=False, skip=None):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    if skip is not None:
        y = y + skip.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _data(n=1, h=12, w=16, c=128, co=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c, co)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    return x, k, b


def test_plain_conv_matches_xla():
    x, k, _ = _data()
    got = c3.conv3x3_fused(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, k)),
                               atol=1e-4, rtol=1e-5)


def test_bias_relu_matches_xla():
    x, k, b = _data(seed=1)
    got = c3.conv3x3_fused(x, k, b, relu=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref(x, k, b, relu=True)),
                               atol=1e-4, rtol=1e-5)


def test_skip_relu_matches_xla():
    x, k, b = _data(seed=2)
    skip = x * 0.3
    got = c3.conv3x3_fused(x, k, b, relu=True, skip=skip)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref(x, k, b, relu=True, skip=skip)),
                               atol=1e-4, rtol=1e-5)


def test_multi_hblock_and_batch():
    # H forces >1 grid step (block ≤ ~1.5MB always holds here; pick H=24 w/ hb
    # dividing it) and N=2 exercises the batch grid axis.
    x, k, b = _data(n=2, h=24, w=8, c=128, seed=3)
    got = c3.conv3x3_fused(x, k, b, relu=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref(x, k, b, relu=True)),
                               atol=1e-4, rtol=1e-5)


def test_grad_x_matches_xla():
    x, k, b = _data(seed=4)
    skip = x * 0.5

    def f_kernel(z, s):
        return jnp.sum(c3.conv3x3_fused(z, k, b, relu=True, skip=s) ** 2)

    def f_ref(z, s):
        return jnp.sum(_ref(z, k, b, relu=True, skip=s) ** 2)

    gx, gs = jax.grad(f_kernel, argnums=(0, 1))(x, skip)
    rx, rs = jax.grad(f_ref, argnums=(0, 1))(x, skip)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), atol=2e-3, rtol=1e-4)


def test_grad_kernel_bias_match_xla():
    x, k, b = _data(seed=5)

    def f_kernel(kk, bb):
        return jnp.sum(c3.conv3x3_fused(x, kk, bb, relu=True) ** 2)

    def f_ref(kk, bb):
        return jnp.sum(_ref(x, kk, bb, relu=True) ** 2)

    gk, gb = jax.grad(f_kernel, argnums=(0, 1))(k, b)
    rk, rb = jax.grad(f_ref, argnums=(0, 1))(k, b)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=5e-3, rtol=1e-4)


def test_packed_decode_kernel_matches_xla_path(monkeypatch):
    """TAESD packed decode via the Pallas kernel ≡ the XLA conv path."""
    from depth_completion_tpu.models import registry, vae_tiny

    cfg = registry.TAESD_CONFIG  # real 64-channel geometry → packed C=128
    params = jax.jit(lambda k: vae_tiny.init_taesd(k, cfg, jnp.float32))(
        jax.random.PRNGKey(0)
    )
    lat = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 8, 16, cfg.latent_channels)),
        jnp.float32,
    )
    monkeypatch.setenv("DCT_CONV_KERNEL", "off")
    ref = vae_tiny.decode(params, lat, cfg)
    gref = jax.grad(lambda z: jnp.sum(vae_tiny.decode(params, z, cfg)))(lat)
    monkeypatch.setenv("DCT_CONV_KERNEL", "on")
    got = vae_tiny.decode(params, lat, cfg)
    ggot = jax.grad(lambda z: jnp.sum(vae_tiny.decode(params, z, cfg)))(lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref), atol=1e-3, rtol=1e-4)


def test_kl_decode_kernel_matches_xla_path(monkeypatch):
    """KL VAE decode via the Pallas kernel ≡ the XLA conv path (--vae full)."""
    from depth_completion_tpu.models import registry, vae_kl

    cfg = registry.VAEConfig(block_out_channels=(128, 128), layers_per_block=1)
    params = jax.jit(lambda k: vae_kl.init_vae(k, cfg, jnp.float32))(
        jax.random.PRNGKey(0)
    )
    lat = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 8, 8, cfg.latent_channels)) * 0.2,
        jnp.float32,
    )
    monkeypatch.setenv("DCT_CONV_KERNEL", "off")
    ref = vae_kl.decode(params, lat, cfg)
    gref = jax.grad(lambda z: jnp.sum(vae_kl.decode(params, z, cfg)))(lat)
    monkeypatch.setenv("DCT_CONV_KERNEL", "on")
    got = vae_kl.decode(params, lat, cfg)
    ggot = jax.grad(lambda z: jnp.sum(vae_kl.decode(params, z, cfg)))(lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref), atol=1e-3, rtol=1e-3)


def test_supported_contract():
    assert c3.supported(jnp.zeros((1, 576, 384, 128)))
    assert not c3.supported(jnp.zeros((1, 576, 384, 64)))  # half lanes
    assert not c3.supported(jnp.zeros((1, 576, 385, 128)))  # W % 8
    assert not c3.supported(jnp.zeros((576, 384, 128)))  # rank


def test_fused_mask_bwd_matches_unfused(monkeypatch):
    """The in-kernel ReLU-mask backward (mask streamed into the dx kernel,
    masked dy emitted as a second output when skip keeps it live) must be
    bit-identical to the pre-fusion formulation (standalone XLA select +
    plain dx kernel, DCT_CONV_FUSED_MASK=0) — same matmuls, same mask, only
    the HBM round trip for the masked tensor is removed."""
    x, k, b = _data(seed=7)
    skip = x * 0.25

    def grads(z, s):
        def f(z, s):
            return jnp.sum(c3.conv3x3_fused(z, k, b, relu=True, skip=s) ** 2)

        return jax.grad(f, argnums=(0, 1))(z, s)

    def grads_no_skip(z):
        def f(z):
            return jnp.sum(c3.conv3x3_fused(z, k, b, relu=True) ** 2)

        return jax.grad(f)(z)

    monkeypatch.setenv("DCT_CONV_FUSED_MASK", "1")
    gx_f, gs_f = grads(x, skip)
    gn_f = grads_no_skip(x)
    monkeypatch.setenv("DCT_CONV_FUSED_MASK", "0")
    gx_u, gs_u = grads(x, skip)
    gn_u = grads_no_skip(x)

    np.testing.assert_array_equal(np.asarray(gx_f), np.asarray(gx_u))
    np.testing.assert_array_equal(np.asarray(gs_f), np.asarray(gs_u))
    np.testing.assert_array_equal(np.asarray(gn_f), np.asarray(gn_u))
