"""Layer primitives vs torch reference semantics."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from depth_completion_tpu.models.layers import (
    attention,
    conv2d,
    group_norm,
    layer_norm,
    linear,
    timestep_embedding,
    upsample_nearest_2x,
)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 5, 32)).astype(np.float32) * 3 + 1
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    ours = group_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x),
        num_groups=8,
        eps=1e-5,
    )
    # torch expects NCHW
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.group_norm(
        xt, 8, torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 48)).astype(np.float32)
    scale = rng.normal(size=(48,)).astype(np.float32)
    bias = rng.normal(size=(48,)).astype(np.float32)
    ours = layer_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x)
    )
    ref = F.layer_norm(
        torch.from_numpy(x), (48,), torch.from_numpy(scale), torch.from_numpy(bias)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 8, 9, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 5)).astype(np.float32)  # HWIO
    b = rng.normal(size=(5,)).astype(np.float32)
    ours = conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    ref = (
        F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), wt, torch.from_numpy(b), padding=1)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_conv2d_stride2_asymmetric_padding():
    """SD VAE downsample: stride 2 with (0,1) bottom/right padding."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 4)).astype(np.float32)
    ours = conv2d(
        {"kernel": jnp.asarray(w)}, jnp.asarray(x), stride=2,
        padding=((0, 1), (0, 1)),
    )
    xt = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (0, 1, 0, 1))
    ref = (
        F.conv2d(xt, torch.from_numpy(np.transpose(w, (3, 2, 0, 1))), stride=2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_attention_matches_torch_sdpa():
    rng = np.random.default_rng(4)
    n, s, c, h = 2, 16, 64, 4
    q, k, v = (rng.normal(size=(n, s, c)).astype(np.float32) for _ in range(3))
    ours = attention(*map(jnp.asarray, (q, k, v)), num_heads=h)
    qt, kt, vt = (
        torch.from_numpy(a).reshape(n, s, h, c // h).transpose(1, 2)
        for a in (q, k, v)
    )
    ref = (
        torch.nn.functional.scaled_dot_product_attention(qt, kt, vt)
        .transpose(1, 2)
        .reshape(n, s, c)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_timestep_embedding_properties():
    emb = timestep_embedding(jnp.asarray([0.0, 500.0]), 320)
    assert emb.shape == (2, 320)
    # t=0: cos part = 1, sin part = 0 (flip_sin_to_cos puts cos first)
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = upsample_nearest_2x(x)
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(
        np.asarray(up[0, :, :, 0]),
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
    )


def test_linear():
    p = {"kernel": jnp.asarray([[1.0, 2.0], [3.0, 4.0]]), "bias": jnp.asarray([0.5, -0.5])}
    out = linear(p, jnp.asarray([[1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(out), [[4.5, 5.5]])


def test_small_kv_attention_matches_general():
    """KV=2 path must equal full softmax attention (cross-attn context)."""
    rng = np.random.default_rng(5)
    n, s, c, h = 2, 32, 64, 4
    q = rng.normal(size=(n, s, c)).astype(np.float32)
    k = rng.normal(size=(n, 2, c)).astype(np.float32)
    v = rng.normal(size=(n, 2, c)).astype(np.float32)
    ours = attention(*map(jnp.asarray, (q, k, v)), num_heads=h)
    qt, kt, vt = (
        torch.from_numpy(a).reshape(a.shape[0], a.shape[1], h, c // h).transpose(1, 2)
        for a in (q, k, v)
    )
    ref = (
        torch.nn.functional.scaled_dot_product_attention(qt, kt, vt)
        .transpose(1, 2)
        .reshape(n, s, c)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)



def test_upsample_conv_2x_matmul_exact():
    """Subpixel matmul formulation == upsample_nearest_2x + 3x3 conv,
    including zero-pad edges, odd sizes, and bias."""
    from depth_completion_tpu.models.layers import (
        conv2d,
        upsample_conv_2x_matmul,
        upsample_nearest_2x,
    )

    rng = np.random.default_rng(11)
    for h, w, c, co in [(1, 1, 4, 4), (5, 7, 8, 16), (9, 12, 32, 16)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
        params = {
            "kernel": jnp.asarray(rng.normal(size=(3, 3, c, co)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(co,)), jnp.float32),
        }
        ref = conv2d(params, upsample_nearest_2x(x))
        got = upsample_conv_2x_matmul(params, x)
        assert got.shape == (2, 2 * h, 2 * w, co)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4,
            err_msg=f"{h}x{w} {c}->{co}",
        )
    # no-bias variant
    p = {"kernel": jnp.asarray(rng.normal(size=(3, 3, 8, 8)), jnp.float32)}
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(upsample_conv_2x_matmul(p, x)),
        np.asarray(conv2d(p, upsample_nearest_2x(x))),
        rtol=1e-5, atol=1e-5,
    )


def test_conv3x3_mean_tap_packed_exact():
    """The packed-domain mean-tap head == unpacked mean-tap == the plain
    mean-of-conv reference, including zero-pad edges and bias — so
    decode_depth can consume the width-packed decoder output without the
    full-tensor unpack relayout."""
    from depth_completion_tpu.models.layers import (
        conv3x3_mean_tap,
        conv3x3_mean_tap_packed,
    )

    rng = np.random.default_rng(13)
    for h, w, c, co in [(6, 8, 4, 3), (5, 10, 8, 3), (12, 16, 16, 1)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
        params = {
            "kernel": jnp.asarray(rng.normal(size=(3, 3, c, co)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(co,)), jnp.float32),
        }
        ref = jnp.mean(conv2d(params, x), axis=-1)
        flat = conv3x3_mean_tap(params, x)
        xp = x.reshape(2, h, w // 2, 2 * c)  # width-pack (even w above)
        packed = conv3x3_mean_tap_packed(params, xp)
        np.testing.assert_allclose(
            np.asarray(flat), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"{h}x{w} {c}->{co} flat",
        )
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(flat), rtol=1e-4, atol=1e-5,
            err_msg=f"{h}x{w} {c}->{co} packed",
        )
    # no-bias variant
    p = {"kernel": jnp.asarray(rng.normal(size=(3, 3, 8, 3)), jnp.float32)}
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3x3_mean_tap_packed(p, x.reshape(1, 4, 4, 16))),
        np.asarray(conv3x3_mean_tap(p, x)),
        rtol=1e-4, atol=1e-5,
    )
